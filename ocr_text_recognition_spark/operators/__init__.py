"""Pure-SQL relational operators (SURVEY.md §2) plus the training-data
pipeline operators (dedup, similarity search, text analysis). Everything in
this package is declarative DataFrame logic — no UDFs — so Catalyst gets
full pushdown/pruning/codegen visibility."""
