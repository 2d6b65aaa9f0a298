"""Unit tests for the deterministic text core (ecc_spark.text).

Each case encodes the reference's documented semantics
(file:line cites in ecc_spark/text.py docstrings), including the revived
golden crop test the reference left commented out
(/root/reference/tests/unit/cmd/test_build_contexts_db.py:1-30).
"""

from ecc_spark import text as X


def test_tokenize_spans_roundtrip():
    t = "Berlin is the capital, isn't it?"
    toks = X.tokenize(t)
    assert [tok.text for tok in toks] == [
        "Berlin", "is", "the", "capital", ",", "isn't", "it", "?",
    ]
    for tok in toks:
        assert t[tok.start : tok.end] == tok.text


def test_sentencize_basic_and_newline():
    t = "First sentence here. Second one! Third?\nFourth via newline"
    sents = [s.text for s in X.sentencize(t)]
    assert sents == ["First sentence here.", "Second one!", "Third?", "Fourth via newline"]


def test_sentencize_no_split_on_inner_dot():
    t = "Version 1.2 shipped today. Next sentence."
    assert [s.text for s in X.sentencize(t)] == ["Version 1.2 shipped today.", "Next sentence."]


def test_sentence_quality_predicate():
    # reference cmd/build_matches_db.py:344-350
    ok = "This sentence is long enough to pass the filter easily."
    assert X.sentence_is_clean(ok)
    assert not X.sentence_is_clean("short.")
    assert not X.sentence_is_clean(ok.lower())
    assert not X.sentence_is_clean(ok[:-1] + " | pipe.")
    assert not X.sentence_is_clean(ok[:-1] + " = markup.")
    assert not X.sentence_is_clean(ok[:-1] + " http link.")
    assert not X.sentence_is_clean(ok[:-1] + " Category:Thing.")


def test_clean_up_text_paragraph_shortcircuit_and_joins():
    good1 = "Aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj."
    good2 = "Bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk."
    bad = "tiny."
    text = f"{good1} {bad} {good2}\nshort para\n{good2}"
    # para 2 skipped (<40 chars) BEFORE sentencizing; bad sentence dropped;
    # sentences joined ' ', paragraphs '\n\n'
    assert X.clean_up_text(text) == f"{good1} {good2}\n\n{good2}"


def test_phrase_match_all_occurrences_case_sensitive():
    t = "Berlin and berlin and Berlin City and Berlin"
    ms = X.phrase_match(t, ["Berlin", "Berlin City"])
    got = [(m.mention, m.start_char) for m in ms]
    # lowercase 'berlin' NOT matched (ORTH, case-sensitive);
    # overlapping 'Berlin' inside 'Berlin City' IS returned (PhraseMatcher does)
    assert ("Berlin", 0) in got
    assert ("Berlin City", 22) in got
    assert ("Berlin", 22) in got
    assert ("Berlin", 38) in got
    assert all(m != ("berlin", 11) for m in got)


def test_crop_tokens_drops_first_and_last():
    # reference cmd/build_contexts_db.py:287-294
    assert X.crop_context_tokens("lin is the capital of Germ") == "is the capital of"
    assert X.crop_context_tokens("one two") == ""
    assert X.crop_context_tokens("one") == ""


def test_crop_sentences_golden():
    # revival of the reference's commented-out golden test:
    # 4 sentences, only the entity-bearing complete ones survive; the LAST
    # surviving sentence is dropped as possibly incomplete
    matcher = X.build_matcher(["Germany"])
    ctx = (
        "ny is a country in Europe. About 80 million people live in Germany. "
        "Germany borders France. lowercase fragment here. The last Germany bit is cut"
    )
    out = X.crop_context_sentences(ctx, matcher)
    # upper-initial sents: [About..., Germany borders France., The last Germany bit is cut]
    # drop last → first two remain; both contain Germany
    assert out == "About 80 million people live in Germany.\nGermany borders France."


def test_mask_context_maximal_spans():
    # reference cmd/build_contexts_db.py:303-354: 'New York' and
    # 'New York City' both match; the contained span is dropped, the
    # maximal one masked
    matcher = X.build_matcher(["New York", "New York City"])
    out = X.mask_context("I love New York City a lot", matcher)
    assert out == "I love ############# a lot"


def test_mask_context_overlap_both_kept():
    # overlapping but not contained → both masked
    matcher = X.build_matcher(["alpha beta", "beta gamma"])
    out = X.mask_context("x alpha beta gamma y", matcher)
    assert out == "x ################ y"


def test_mask_context_no_match_returns_none():
    matcher = X.build_matcher(["absent"])
    assert X.mask_context("nothing to see", matcher) is None
