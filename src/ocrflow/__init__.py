"""ocrflow — a from-scratch PySpark-native main-content extraction engine.

Re-imagines the segment-then-classify recognition loop of the reference
(``BingLiHanShuang/chinese_ocr``: projection-profile segmentation,
batched per-glyph classification, greedy decode — see BASELINE.json
``north_star``) as an Arrow-vectorized extraction stage over tables of
multi-turn transcripts. NOT a port: no OpenCV, no TensorFlow, no image
I/O — the unit of work is a raw text payload (html / pdf-layout dump /
plain), the "glyphs" are CJK-aware spans, the "CNN" is a broadcast
linear classify kernel, and the "greedy decode" is the score-thresholded
stitch into ``extracted_text``.

Layout (SURVEY.md §7):
  reference.py  — single-node golden extractor (the byte-equality oracle)
  chartables.py — codepoint class tables + the linear classify kernel
  synth.py      — deterministic synthetic transcripts generator
  kernel.py     — Arrow record-batch kernel wrapping reference.py
  pipeline.py   — the distributed Spark pipeline (salt, order, kernel, write)
  icelite.py    — snapshot/manifest table layer (Iceberg-shaped seam)
  queries.py    — relational operator corpus (SURVEY.md §2.B)
  streaming.py  — Structured Streaming operator corpus
"""

__version__ = "0.1.0"
