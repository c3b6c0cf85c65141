"""Porter2 stemmer goldens (SURVEY.md §5 item 1).

Pairs verified by hand against the published Snowball english spec
(snowballstem.org/algorithms/english/stemmer.html); each exercises a
specific step of the algorithm.
"""

from nadry_spark.functions.porter2 import stem

GOLDEN = {
    # exceptional forms
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
    # invariant past 1a
    "inning": "inning",
    "outing": "outing",
    "canning": "canning",
    "herring": "herring",
    "earring": "earring",
    "proceed": "proceed",
    "exceed": "exceed",
    "succeed": "succeed",
    # step 1a
    "caresses": "caress",
    "ponies": "poni",
    "ties": "tie",
    "cries": "cri",
    "gaps": "gap",
    "gas": "gas",
    "this": "this",
    "kiwis": "kiwi",
    # step 1b
    "agreed": "agre",
    "feed": "feed",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "running": "run",
    # step 1c
    "happy": "happi",
    "crying": "cri",
    "say": "say",
    "enjoy": "enjoy",
    # step 2
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "happily": "happili",
    # step 3
    "triplicate": "triplic",
    "formative": "format",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "communism": "communism",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "agreement": "agreement",
    "national": "nation",
    # step 5
    "probate": "probat",
    "rate": "rate",
    "controll": "control",
    "roll": "roll",
    # R1 prefix exceptions
    "generously": "generous",
    "generalization": "general",
    "communication": "communic",
    "arsenal": "arsenal",
    # misc
    "_url_": "_url_",
    "flying": "fli",
    "beautiful": "beauti",
    "beauty": "beauti",
    "apple": "appl",
}


def test_goldens():
    failures = {w: (stem(w), want) for w, want in GOLDEN.items() if stem(w) != want}
    assert not failures, f"porter2 mismatches (got, want): {failures}"


def test_short_words_untouched():
    for w in ["a", "ab", "by", "we", "i", ""]:
        assert stem(w) == w


def test_output_lowercase_no_capital_y():
    for w in ["yearly", "saying", "boyhood", "yes", "stymied"]:
        assert "Y" not in stem(w)
