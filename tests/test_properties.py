"""Property-based tests for the golden extractor (SURVEY.md §5.3)."""

from hypothesis import given, settings, strategies as st

from ocrflow import reference as R

payloads = st.one_of(
    st.text(max_size=400),
    st.text(alphabet=st.characters(min_codepoint=0x4E00, max_codepoint=0x9FFF),
            max_size=100),
    st.builds(lambda body: f"<html><body><p>{body}</p></body></html>",
              st.text(max_size=200)),
    st.builds(lambda a, b: f"1,10,5,b0\t{a}\n1,5,5,b1\t{b}",
              st.text(alphabet=st.characters(blacklist_characters="\n\t",
                                             blacklist_categories=("Cs",)),
                      max_size=80),
              st.text(alphabet=st.characters(blacklist_characters="\n\t",
                                             blacklist_categories=("Cs",)),
                      max_size=80)),
)


@settings(max_examples=150, deadline=None)
@given(payloads)
def test_deterministic_and_total(payload):
    a = R.extract_turn(payload)
    b = R.extract_turn(payload)
    assert a.extracted_text == b.extracted_text
    assert a.spans == b.spans


@settings(max_examples=150, deadline=None)
@given(payloads)
def test_span_invariants(payload):
    r = R.extract_turn(payload)
    n = len(r.extracted_text)
    prev_start = -1
    for s, e, kind, score in r.spans:
        assert 0 <= s < e <= n
        assert s >= prev_start
        prev_start = s
        assert kind in R.SPAN_KINDS
        assert score == score  # not NaN
    # spans of the same pass never overlap (CJK per-char spans abut)
    ends = [e for _, e, _, _ in r.spans]
    starts = [s for s, _, _, _ in r.spans]
    for i in range(1, len(starts)):
        assert starts[i] >= starts[i - 1]


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_idempotent_on_plain_output(payload):
    """Extracting an extraction's plain output is a fixpoint for text
    content (whitespace-collapsed plain paragraphs)."""
    first = R.extract_turn(payload)
    if first.payload_kind != "plain" and first.extracted_text:
        again = R.extract_turn(first.extracted_text)
        # re-extraction never invents characters
        assert set(again.extracted_text) <= set(first.extracted_text) | {" ", "\n"}


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_no_control_chars_in_output(payload):
    out = R.extract_turn(payload).extracted_text
    assert not any(ord(c) < 0x20 and c not in "\n\t" for c in out)
    assert not any(0xD800 <= ord(c) < 0xE000 for c in out)
