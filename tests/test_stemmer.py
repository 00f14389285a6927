"""Porter stemmer (functions/stemmer.py) against canonical vectors."""

from __future__ import annotations

import pytest

from ru_cdc_spark.functions.stemmer import porter_stem

VECTORS = {
    # step 1 family
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed",
    "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop",
    "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3 (note: later steps continue — 'electrical' ends 'electr',
    # matching the full published pipeline, not the paper's isolated
    # step-3 illustration)
    "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electrical": "electr",
    "hopeful": "hope", "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


@pytest.mark.parametrize("word,stem", sorted(VECTORS.items()))
def test_canonical_vectors(word, stem):
    assert porter_stem(word) == stem


def test_short_words_untouched():
    for w in ("a", "is", "be", "on"):
        assert porter_stem(w) == w


def test_inflection_family_collapses():
    stems = {porter_stem(w) for w in
             ("connect", "connected", "connecting", "connection",
              "connections")}
    assert stems == {"connect"}
