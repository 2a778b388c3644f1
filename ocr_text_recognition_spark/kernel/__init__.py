"""Pure-numpy recognition kernel.

This package re-implements the reference's per-image pipeline
(/root/reference/src/model/ocr_model.py and
/root/reference/src/services/{table_ocr_service,enhanced_table_ocr_service}.py)
with zero native-CV dependencies: a fixed 5x7 glyph atlas plays the role of
the OCR engine's character classifier, images render/recognize
deterministically, and the "CNN+CTC greedy decode" stage becomes a
template-correlation logit matrix + per-segment greedy argmax.

The kernel is deliberately NOT Spark-aware: everything takes/returns numpy
or plain Python values so it can run (a) standalone to freeze golden
fixtures, and (b) inside Arrow-batched pandas UDFs on executors
(extraction/udfs.py), which is the only place Spark touches it.
"""

from ocr_text_recognition_spark.kernel.font import GLYPHS, glyph_atlas
from ocr_text_recognition_spark.kernel.imgcodec import decode_image, encode_image
