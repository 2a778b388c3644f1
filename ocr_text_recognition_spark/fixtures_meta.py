"""Shared fixture rows for the metadata-extraction driver query (q46).

One definition consumed by BOTH the Spark query (__spark_entry__) and the
DuckDB oracle (oracles.py), so the fixture cannot drift between the two
sides. The rows exercise every shape of the reference's pattern table
(/root/reference/src/services/table_ocr_service.py:452-479):

- doc 1: first-alternate diacritic Vietnamese headers (Họ tên/Lớp/Trường/
  Môn/Học kỳ/Năm học)
- doc 2: SECOND alternates the reference carries — Học sinh -> student,
  Khối -> class — plus English Subject/Semester/Academic year
- doc 3: English first alternates + the ASCII 'Year:' fallback (the
  reference's year pattern needs 'Năm học'/'Academic year'; the repo's
  trailing ASCII pattern catches bare 'Year:')
- doc 4: bare Tên + the Grade second alternate
- doc 5: separator-less headers — the reference's [\\s:]* makes the colon
  optional
- doc 6: no headers at all -> every field NULL
"""

from __future__ import annotations

METADATA_DOCS: list[tuple[int, str]] = [
    (
        1,
        "Họ tên: Nguyễn Văn A\nLớp: 10A1\nTrường: THPT Chu Văn An\n"
        "Môn: Toán\nHọc kỳ: 1\nNăm học: 2024-2025",
    ),
    (
        2,
        "Học sinh: Trần Thị B\nKhối: 11\nSubject: Physics\n"
        "Semester: 2\nAcademic year: 2023-2024",
    ),
    (3, "Name: John Smith\nClass: 12C\nSchool: Springfield High\nYear: 2022-2023"),
    (4, "Tên: Lê Văn C\nGrade: 9\nMôn: Văn"),
    (5, "Student Pham Van D\nGrade 8"),
    (6, "plain paragraph with no headers"),
]
