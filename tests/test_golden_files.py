"""Frozen golden files (SURVEY.md §5.1): hand-written payloads whose
extraction output is pinned byte-for-byte in tests/golden/*.json.
Any semantic drift in the extractor fails here with a readable diff."""

import json
import os

import pytest

from ocrflow import reference as R

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = sorted(f for f in os.listdir(GOLDEN_DIR) if f.endswith(".json"))


@pytest.mark.parametrize("fname", CASES)
def test_golden(fname):
    with open(os.path.join(GOLDEN_DIR, fname)) as f:
        g = json.load(f)
    r = R.extract_turn(g["payload"], role=g.get("role"))
    assert r.payload_kind == g["payload_kind"], fname
    assert r.extracted_text == g["extracted_text"], fname
    assert [[s, e, k, sc] for s, e, k, sc in r.spans] == g["spans"], fname
