"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Produces the pipeline's input table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` byte-
deterministically from (seed, conv, turn) — no external data
(BASELINE.json input_hint). Payload taxonomy: 50% html, 20% pdf-dump,
25% plain/markdown, 5% degenerate; conversation sizes follow a skewed
profile with occasional "monster" conversations (the skew fixture for
SURVEY.md §5.6).

Two entry points:
  gen_rows(...)        — driver-side list of dicts (tests, tiny scales)
  synth_dataframe(...) — distributed: spark.range → mapInArrow, each
                         task generating its slice from the same pure
                         function, so bench inputs scale without a
                         driver bottleneck.

Determinism: ``random.Random`` seeded with a string uses the sha512
path (version=2 seeding) — stable across platforms and processes.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np

BASE_TS = datetime(2025, 1, 1, 0, 0, 0)

_WORDS = ("data spark arrow batch vector column stream shuffle merge scan "
          "filter join window salt skew table snapshot commit lineage turn "
          "model glyph span block score decode stitch kernel profile order "
          "quick brown fox jumps lazy dog alpha beta gamma delta epsilon").split()
_CJK_POOL = "中文内容处理引擎分布式计算数据湖表快照提交谱系批量向量列流高效扩展容错恢复检查点字符分割识别解码拼接内核轮廓顺序质量评分模型广播分区倾斜盐值哈希"
_TOOLS = ("search", "browser", "python")
_NAV_WORDS = ("Home", "About", "Products", "Contact", "Login", "Sign up",
              "Privacy", "Terms", "Sitemap", "Careers")


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _cjk_run(rng: random.Random, n: int) -> str:
    s = "".join(rng.choice(_CJK_POOL) for _ in range(n))
    return s + rng.choice(["。", "，好的。", "！", "？"])


def _gen_html(rng: random.Random) -> str:
    nav = " ".join(f'<a href="/{w.lower()}">{w}</a>' for w in
                   rng.sample(_NAV_WORDS, rng.randint(3, 6)))
    paras = []
    for _ in range(rng.randint(1, 4)):
        if rng.random() < 0.4:
            paras.append(f"<p>{_sentence(rng, rng.randint(8, 25))} "
                         f"{_cjk_run(rng, rng.randint(4, 20))}</p>")
        else:
            paras.append(f"<p>{_sentence(rng, rng.randint(10, 30))}</p>")
    linkfarm = " ".join(f'<a href="/l{i}">{rng.choice(_WORDS)}</a>'
                        for i in range(rng.randint(4, 10)))
    entity_bits = "Fish &amp; chips &#x4e2d; &#22269;" if rng.random() < 0.5 else ""
    script = "<script>var x = 1 < 2;</script>" if rng.random() < 0.5 else ""
    malformed = "</p></div></span>" if rng.random() < 0.3 else ""
    return (f"<html><head><title>t</title><style>.x{{color:red}}</style></head>"
            f"<body><nav>{nav}</nav>{script}"
            f"<article>{''.join(paras)}<p>{entity_bits}</p></article>"
            f"<div>{linkfarm}</div>"
            f"<footer>&copy; footer {rng.randint(2000, 2026)}</footer>"
            f"{malformed}</body></html>")


def _gen_pdf(rng: random.Random) -> str:
    recs = []
    bid = 0
    for page in range(1, rng.randint(2, 4)):
        for _ in range(rng.randint(2, 6)):
            y, x = rng.randint(1, 900), rng.randint(1, 600)
            txt = (_cjk_run(rng, rng.randint(5, 15)) if rng.random() < 0.3
                   else _sentence(rng, rng.randint(4, 12)))
            recs.append(f"{page},{y},{x},b{bid}\t{txt}")
            bid += 1
    rng.shuffle(recs)  # emitted out of reading order (FIXTURES.md §1.2)
    return "\n".join(recs)


def _gen_plain(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 3)):
        s = _sentence(rng, rng.randint(6, 20))
        if rng.random() < 0.3:
            s += " " + _cjk_run(rng, rng.randint(3, 10))
        if rng.random() < 0.2:
            s += " ＡＢＣ１２３"  # full-width fold fixture
        parts.append(s)
    sep = "\r\n\r\n" if rng.random() < 0.3 else "\n\n"
    out = sep.join(parts)
    if rng.random() < 0.3:
        out += f"{sep}```python\ndef f_{rng.randint(0, 99)}(x):\n    return x * 2\n```"
    if rng.random() < 0.2:
        out = "  " + out + "  \n"
    return out


def _gen_degenerate(rng: random.Random):
    c = rng.random()
    if c < 0.2:
        return ""
    if c < 0.4:
        return "   \n\t  "
    if c < 0.55:
        return "<div><span></span></div>"
    if c < 0.7:
        return rng.choice(_CJK_POOL)
    if c < 0.85:
        return None  # null text row: passes through with empty extraction
    return "x" * 4096  # long single line (1 MB variant reserved for unit tests)


def gen_text(conv_i: int, turn_idx: int, seed: int = 42):
    """Pure payload function of (seed, conv, turn) — the determinism anchor."""
    rng = random.Random(f"{seed}:{conv_i}:{turn_idx}")
    c = rng.random()
    if c < 0.50:
        return _gen_html(rng)
    if c < 0.70:
        return _gen_pdf(rng)
    if c < 0.95:
        return _gen_plain(rng)
    return _gen_degenerate(rng)


def gen_turn(conv_i: int, turn_idx: int, seed: int = 42) -> dict:
    rng = random.Random(f"{seed}:meta:{conv_i}:{turn_idx}")
    r = rng.random()
    if r < 0.10:
        role, tool = "tool", rng.choice(_TOOLS)
    elif r < 0.12:
        role, tool = "system", ""
    elif turn_idx % 2 == 0:
        role, tool = "user", ""
    else:
        role, tool = "assistant", ""
    jitter = rng.randint(-3, 15) if rng.random() < 0.15 else 0  # late-data fixture
    ts = BASE_TS + timedelta(seconds=conv_i * 60 + turn_idx * 7 + jitter)
    return {"conv_id": f"conv-{conv_i:08d}", "turn_idx": turn_idx,
            "role": role, "text": gen_text(conv_i, turn_idx, seed),
            "tool": tool, "ts": ts}


def plan_sizes(n_turns: int, seed: int = 42, monster_every: int = 1000,
               monster_size: int = 100_000) -> np.ndarray:
    """Conversation-size profile: 97% small (2–40), 3% long (100–1000),
    one monster per `monster_every` convs (FIXTURES.md §1.1)."""
    rng = random.Random(f"{seed}:plan")
    sizes: list[int] = []
    total = 0
    while total < n_turns:
        i = len(sizes)
        if monster_every and i > 0 and i % monster_every == 0:
            s = monster_size
        elif rng.random() < 0.03:
            s = rng.randint(100, 1000)
        else:
            s = rng.randint(2, 40)
        s = min(s, n_turns - total)
        sizes.append(s)
        total += s
    return np.array(sizes, dtype=np.int64)


def _conv_lookup(sizes: np.ndarray):
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return offsets


def gen_rows(n_turns: int, seed: int = 42, shuffled: bool = True,
             monster_every: int = 1000, monster_size: int = 100_000) -> list[dict]:
    """Driver-side generation for tests: rows shuffled across and within
    convs so the stable (conv_id, turn_idx) re-ordering is exercised."""
    sizes = plan_sizes(n_turns, seed, monster_every, monster_size)
    rows = [gen_turn(ci, ti, seed)
            for ci, s in enumerate(sizes) for ti in range(s)]
    if shuffled:
        random.Random(f"{seed}:shuffle").shuffle(rows)
    return rows


TRANSCRIPTS_DDL = ("conv_id string, turn_idx int, role string, "
                   "text string, tool string, ts timestamp")


def synth_dataframe(spark, n_turns: int, seed: int = 42, partitions: int = 32,
                    monster_every: int = 1000, monster_size: int = 100_000):
    """Distributed generator: spark.range(n) → mapInArrow.

    Each task maps its global ids to (conv, turn) via the broadcast
    offsets array (np.searchsorted) and calls the same pure gen_turn —
    no driver-side materialization, so bench inputs (≥10^6 turns,
    SURVEY.md §6) generate in parallel.
    """
    import pyarrow as pa

    sizes = plan_sizes(n_turns, seed, monster_every, monster_size)
    offsets = _conv_lookup(sizes)
    sc = spark.sparkContext
    b_offsets = sc.broadcast(offsets)

    def gen_batches(it):
        offs = b_offsets.value
        for batch in it:
            ids = batch.column(0).to_numpy()
            conv = np.searchsorted(offs, ids, side="right") - 1
            turn = ids - offs[conv]
            rows = [gen_turn(int(c), int(t), seed) for c, t in zip(conv, turn)]
            yield pa.RecordBatch.from_pylist(
                rows, schema=pa.schema([
                    pa.field("conv_id", pa.string()),
                    pa.field("turn_idx", pa.int32()),
                    pa.field("role", pa.string()),
                    pa.field("text", pa.string()),
                    pa.field("tool", pa.string()),
                    pa.field("ts", pa.timestamp("us")),
                ]))

    return (spark.range(0, int(n_turns), 1, partitions)
            .mapInArrow(gen_batches, TRANSCRIPTS_DDL))
