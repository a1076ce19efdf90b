"""Reference-suite port: src/tests/stemmer.test.ts against
pure/stemmer — Porter steps 1a/1b/1c/2/3/4/5, irregular-verb
normalization (and its deliberate ambiguity exclusions), shared-stem
properties, stem_tokens."""

import pytest

from webpeel_spark.pure.stemmer import IRREGULAR_FORMS, stem, stem_tokens

EXACT = [
    # step 1a — plurals
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("dogs", "dog"),
    # step 1b — past tense / gerunds
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("disabled", "disabl"),
    ("running", "run"),
    ("fitting", "fit"),
    ("failing", "fail"),
    ("filing", "file"),
    ("created", "creat"),
    # step 1c — y → i
    ("happy", "happi"),
    ("sky", "sky"),
    # steps 2-4 chains
    ("effectiveness", "effect"),
    ("developer", "develop"),
    ("limitations", "limit"),
    # short words untouched
    ("a", "a"),
    ("to", "to"),
]


@pytest.mark.parametrize("word,expected", EXACT)
def test_exact_stems(word, expected):
    assert stem(word) == expected


SHARED = [
    ("limit", "limitations"),
    ("run", "running"),
    ("price", "pricing"),
    ("develop", "developer"),
    ("configure", "configured"),
    ("install", "installing"),
    ("general", "generalization"),
    ("effect", "effectiveness"),
    # irregular verbs
    ("built", "build"),
    ("ran", "run"),
    ("made", "make"),
    ("wrote", "write"),
    ("began", "begin"),
    ("gave", "give"),
    ("took", "take"),
    ("knew", "know"),
    ("thought", "think"),
    ("spoke", "speak"),
    ("chose", "choose"),
    ("kept", "keep"),
    ("sent", "send"),
    ("taught", "teach"),
    ("caught", "catch"),
    ("sold", "sell"),
]


@pytest.mark.parametrize("a,b", SHARED)
def test_shared_stems(a, b):
    assert stem(a) == stem(b)


def test_ambiguous_words_not_normalized():
    # "founded a company" / "turned left" are common — the reference
    # deliberately keeps these out of IRREGULAR_FORMS
    assert stem("found") != stem("find")
    assert stem("left") != stem("leave")
    for w in ("found", "left", "bore", "bound"):
        assert w not in IRREGULAR_FORMS


def test_irregular_normalization_idempotent():
    for w in ("built", "ran", "made", "wrote", "began", "took"):
        s1 = stem(w)
        assert stem(s1) == s1


def test_empty_and_case():
    assert stem("") == ""
    assert stem("Running") == stem("running")
    assert stem("LIMITATIONS") == stem("limitations")


def test_stem_tokens():
    assert stem_tokens(["running", "limitations", "pricing"]) == [
        stem("running"), stem("limitations"), stem("pricing")]
    assert stem_tokens([]) == []
