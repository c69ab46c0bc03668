"""Tests for the deterministic transcript generator (FIXTURES.md §1)."""

from ocrflow import synth


def test_deterministic():
    a = synth.gen_rows(500, seed=42, monster_every=0)
    b = synth.gen_rows(500, seed=42, monster_every=0)
    assert a == b
    c = synth.gen_rows(500, seed=43, monster_every=0)
    assert a != c


def test_row_shape_and_coverage():
    rows = synth.gen_rows(1000, seed=42, monster_every=0)
    assert len(rows) == 1000
    keys = {(r["conv_id"], r["turn_idx"]) for r in rows}
    assert len(keys) == 1000  # unique (conv, turn)
    roles = {r["role"] for r in rows}
    assert roles <= {"user", "assistant", "tool", "system"}
    assert any(r["role"] == "tool" and r["tool"] for r in rows)
    assert any(r["text"] is None for r in rows) or True  # nulls allowed
    # payload mix: all three kinds appear
    texts = [r["text"] for r in rows if r["text"]]
    assert any(t.lstrip().lower().startswith("<html") for t in texts)
    assert any("\t" in t and t[0].isdigit() for t in texts)


def test_rows_are_shuffled():
    rows = synth.gen_rows(300, seed=42, monster_every=0)
    in_order = all(rows[i]["turn_idx"] <= rows[i + 1]["turn_idx"]
                   for i in range(len(rows) - 1)
                   if rows[i]["conv_id"] == rows[i + 1]["conv_id"])
    assert not in_order or len(rows) < 3


def test_monster_conv_skew():
    rows = synth.gen_rows(800, seed=42, monster_every=10, monster_size=300)
    from collections import Counter
    sizes = Counter(r["conv_id"] for r in rows)
    assert max(sizes.values()) >= 200  # monster dominates
