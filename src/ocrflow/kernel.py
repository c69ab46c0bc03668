"""The Arrow record-batch extraction kernel (SURVEY.md §2.A A2–A7, A9).

This is the graft analog of the reference's inference hot loop: the JVM
streams Arrow record batches into the Python worker
(``df.mapInArrow``), the kernel runs the A2–A7 extraction per batch,
and span columns are assembled as flat Arrow buffers — no per-span
Python objects cross back. Model state (weights/thresholds) arrives via
a Spark broadcast created once per run and deserialized once per
executor (A9), mirroring the reference's load-model-once behavior.

Batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
— the graft analog of the reference's inference batch size
(BASELINE.json north_star: "inference batches sized per Arrow record
batch to keep the classify kernel saturated").
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from . import reference as R

#: Spark DDL for the extracted table (SURVEY.md §1.2, amended: span kind
#: ships as a dictionary CODE, not a string — 5.6M per-span UTF8String
#: materializations in the JVM collapsed 32-core throughput ~6x; decode
#: lazily with pipeline.decode_spans() / kernel.SPAN_KINDS)
EXTRACTED_DDL = (
    "conv_id string, turn_idx int, extracted_text string, "
    "spans array<struct<start:int, end:int, kind_code:tinyint, score:double>>, "
    "payload_kind string, n_spans int"
)

_SPAN_STRUCT = pa.struct([
    pa.field("start", pa.int32()),
    pa.field("end", pa.int32()),
    pa.field("kind_code", pa.int8()),
    pa.field("score", pa.float64()),
])

_OUT_SCHEMA = pa.schema([
    pa.field("conv_id", pa.string()),
    pa.field("turn_idx", pa.int32()),
    pa.field("extracted_text", pa.string()),
    pa.field("spans", pa.list_(_SPAN_STRUCT)),
    pa.field("payload_kind", pa.string()),
    pa.field("n_spans", pa.int32()),
])

#: kind-code → kind-string dictionary (export for consumers)
SPAN_KINDS = R.SPAN_KINDS


def extract_batch(batch: pa.RecordBatch, weights: dict) -> pa.RecordBatch:
    """Extract one Arrow batch; returns the extracted batch.

    Span columns are built vectorized: per-row numpy arrays are
    concatenated once, the kind strings come from a dictionary take,
    and the list offsets close over the whole batch.
    """
    texts = batch.column(batch.schema.get_field_index("text")).to_pylist()
    role_idx = batch.schema.get_field_index("role")
    roles = (batch.column(role_idx).to_pylist() if role_idx >= 0
             else [None] * len(texts))
    n = len(texts)
    ex_texts: list[str] = []
    kinds: list[str] = []
    starts_l, ends_l, kc_l, sc_l = [], [], [], []
    offsets = np.zeros(n + 1, dtype=np.int32)
    for i, t in enumerate(texts):
        ex, st, en, kc, sc, kind = R.extract_turn_arrays(t, weights, roles[i])
        ex_texts.append(ex)
        kinds.append(kind)
        starts_l.append(st)
        ends_l.append(en)
        kc_l.append(kc)
        sc_l.append(sc)
        offsets[i + 1] = offsets[i] + len(st)

    starts = np.concatenate(starts_l) if starts_l else np.empty(0, np.int64)
    ends = np.concatenate(ends_l) if ends_l else np.empty(0, np.int64)
    kcodes = np.concatenate(kc_l) if kc_l else np.empty(0, np.int64)
    scores = np.concatenate(sc_l) if sc_l else np.empty(0, np.float64)

    span_struct = pa.StructArray.from_arrays(
        [pa.array(starts.astype(np.int32), type=pa.int32()),
         pa.array(ends.astype(np.int32), type=pa.int32()),
         pa.array(kcodes.astype(np.int8), type=pa.int8()),
         pa.array(scores, type=pa.float64())],
        fields=list(_SPAN_STRUCT))
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                     span_struct)
    n_spans = np.diff(offsets).astype(np.int32)

    return pa.RecordBatch.from_arrays(
        [batch.column(batch.schema.get_field_index("conv_id")),
         batch.column(batch.schema.get_field_index("turn_idx")).cast(pa.int32()),
         pa.array(ex_texts, type=pa.string()),
         spans,
         pa.array(kinds, type=pa.string()),
         pa.array(n_spans, type=pa.int32())],
        schema=_OUT_SCHEMA)


def make_kernel(broadcast_weights, lineage_acc=None, input_file_col: str | None = None):
    """Build the mapInArrow function.

    ``broadcast_weights`` is a ``pyspark.Broadcast`` of the model dict
    (A9: torrent-broadcast once per executor). If ``lineage_acc`` (a
    list accumulator) is given, the kernel emits one lineage record per
    task: (partition_id, input_file, rows_in, rows_out, turn_lo,
    turn_hi, wall_ms) — zero extra Spark jobs (SURVEY.md §2.A A11).
    """

    def kernel(batches):
        from pyspark import TaskContext
        weights = broadcast_weights.value
        t0 = time.perf_counter()
        rows = 0
        turn_lo, turn_hi = None, None
        files = set()
        for batch in batches:
            if input_file_col is not None:
                idx = batch.schema.get_field_index(input_file_col)
                col = batch.column(idx)
                if len(col):
                    files.add(col[0].as_py())
                batch = batch.drop_columns([input_file_col])
            out = extract_batch(batch, weights)
            rows += out.num_rows
            if out.num_rows and lineage_acc is not None:
                ti = out.column(1)
                lo = pa.compute.min(ti).as_py()
                hi = pa.compute.max(ti).as_py()
                turn_lo = lo if turn_lo is None else min(turn_lo, lo)
                turn_hi = hi if turn_hi is None else max(turn_hi, hi)
            yield out
        if lineage_acc is not None:
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else -1
            lineage_acc.add([(pid, ",".join(sorted(files)), rows, rows,
                              turn_lo if turn_lo is not None else -1,
                              turn_hi if turn_hi is not None else -1,
                              (time.perf_counter() - t0) * 1000.0)])

    return kernel
