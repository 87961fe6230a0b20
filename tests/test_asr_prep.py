"""ASR data-prep walkers (data/asr_prep.py) against miniature fixture
trees mirroring the LDC distribution layouts the reference scripts walk
(`local/fisher_data_prep.sh`, `local/swbd1_data_prep.sh`,
`local/swbd1_map_words.pl`, `local/fisher_swbd_prepare_dict.sh`,
`local/make_mx6*.{sh,pl}`)."""

import os

import pytest

from sepi_tpu.data.asr_prep import (
    apply_oov,
    build_lexicon,
    map_swbd_word,
    normalize_fisher_words,
    read_cmudict,
    walk_fisher,
    walk_mx6,
    walk_mx6_calls,
    walk_mx6_mic,
    walk_swbd1,
)


# ---------------------------------------------------------------------------
# Fisher
# ---------------------------------------------------------------------------

FISHER_TRAN = """# fe_03_00004.sph
# Transcribed at the LDC

7.38 8.78 A: an- so the topic is
9.10 10.00 B: yeah [laugh] okay
11.00 12.00 A: (( unclear words ))
13.00 14.50 B: i [cough] think so
15.00 15.20 A:
"""


@pytest.fixture
def fisher_dir(tmp_path):
    root = tmp_path / "fisher"
    trans = root / "fe_03_tran" / "trans" / "000"
    trans.mkdir(parents=True)
    (trans / "fe_03_00004.txt").write_text(FISHER_TRAN)
    doc = root / "fe_03_tran" / "doc"
    doc.mkdir()
    (doc / "fe_03_p1_filelist.tbl").write_text(
        "fe_03_p1_sph1 fe_03_00004.sph fm 9.9\n"
    )
    sph = root / "fe_03_data_sph" / "000"
    sph.mkdir(parents=True)
    (sph / "fe_03_00004.sph").write_bytes(b"NIST_1A\n")
    return str(root)


def test_walk_fisher(fisher_dir):
    ds, text = walk_fisher([fisher_dir])
    # (( row and empty row dropped; 3 utterances survive
    assert len(ds) == 3
    u = ds["fe_03_00004-A-000738-000878"]
    assert u.spk_id == "fe_03_00004-A"
    assert u.recording == "fe_03_00004-A"
    assert (u.start, u.end) == (7.38, 8.78)
    assert u.get_meta("channel") == "1"
    assert u.get_meta("gender") == "f"
    assert u.wav.endswith("fe_03_00004.sph")
    assert text["fe_03_00004-A-000738-000878"] == ["an-", "so", "the", "topic", "is"]
    # noise-token canonicalization (fisher_data_prep.sh:136-144)
    assert text["fe_03_00004-B-000910-001000"] == ["yeah", "[laughter]", "okay"]
    assert text["fe_03_00004-B-001300-001450"] == ["i", "[noise]", "think", "so"]
    b = ds["fe_03_00004-B-000910-001000"]
    assert b.get_meta("channel") == "2"
    assert b.get_meta("gender") == "m"


def test_normalize_fisher_drops_uncertain():
    assert normalize_fisher_words(["((", "huh", "))"]) is None
    assert normalize_fisher_words([]) is None
    assert normalize_fisher_words(["[sigh]"]) == ["[noise]"]


# ---------------------------------------------------------------------------
# SWBD-1 word mapping + walker
# ---------------------------------------------------------------------------

def test_map_swbd_word_reference_examples():
    # the examples swbd1_map_words.pl documents in its own comments
    assert map_swbd_word("[LAUGHTER-STORY]") == "STORY"
    assert map_swbd_word("[IT'N/ISN'T]") == "IT'N"
    assert map_swbd_word("-[AN]Y") == "-Y"
    assert map_swbd_word("[AN]Y") == "-Y"  # leading - optional on input
    assert map_swbd_word("AB[SOLUTE]-") == "AB-"
    assert map_swbd_word("AB[SOLUTE]") == "AB-"  # trailing - optional
    assert map_swbd_word("{YUPPIEDOM}") == "YUPPIEDOM"
    assert map_swbd_word("THEM_1") == "THEM"
    assert map_swbd_word("them_1") == "them"
    assert map_swbd_word("okay") == "okay"  # plain words untouched
    # case-insensitive (the Edinburgh modification)
    assert map_swbd_word("[laughter-story]") == "story"


SWBD_TRANS = """sw2001A-ms98-a-0001 0.98 11.56 okay so [SILENCE] um
sw2001A-ms98-a-0002 12.00 13.00 [SILENCE]
sw2001B-ms98-a-0001 2.50 4.00 <B_ASIDE> yeah right
"""


@pytest.fixture
def swbd_dir(tmp_path):
    root = tmp_path / "swbd"
    tr = root / "docs" / "swb_ms98_transcriptions" / "20" / "2001"
    tr.mkdir(parents=True)
    (tr / "sw2001A-ms98-a-trans.text").write_text(SWBD_TRANS)
    aud = root / "data"
    aud.mkdir()
    (aud / "sw02001.sph").write_bytes(b"NIST_1A\n")
    return str(root)


def test_walk_swbd1(swbd_dir):
    ds, text = walk_swbd1(swbd_dir)
    # silence-only utterance dropped
    assert len(ds) == 2
    u = ds["sw02001-A_000098-001156"]
    assert u.spk_id == "sw02001-A"
    assert (u.start, u.end) == (0.98, 11.56)
    assert u.get_meta("channel") == "1"
    assert u.wav.endswith("sw02001.sph")
    assert text["sw02001-A_000098-001156"] == ["okay", "so", "um"]
    # aside marker stripped, channel 2 for side B
    b = ds["sw02001-B_000250-000400"]
    assert b.get_meta("channel") == "2"
    assert text["sw02001-B_000250-000400"] == ["yeah", "right"]


# ---------------------------------------------------------------------------
# CMUdict lexicon builder
# ---------------------------------------------------------------------------

CMUDICT = """;;; # CMUdict comment
OKAY  OW2 K EY1
SO  S OW1
UM  AH1 M
C.  S IY1
C.(2)  S IY0
N.  EH1 N
"""


def test_read_cmudict(tmp_path):
    p = tmp_path / "cmudict.0.7a"
    p.write_text(CMUDICT)
    d = read_cmudict(str(p))
    # lowercased, stress stripped, alternates dropped
    assert d["okay"] == ["ow", "k", "ey"]
    assert d["c."] == ["s", "iy"]
    assert ";;;" not in " ".join(d)


def test_build_lexicon(tmp_path):
    p = tmp_path / "cmudict.0.7a"
    p.write_text(CMUDICT)
    cmu = read_cmudict(str(p))
    text = {
        "u1": ["okay", "so", "[laughter]", "c._n._n.", "zzyzx"],
        "u2": ["um", "mm", "so"],
    }
    lex, oov = build_lexicon(text, cmu)
    assert lex.pron["okay"] == ("ow", "k", "ey")
    # underscore-compound expansion (prepare_dict.sh:66-82)
    assert lex.pron["c._n._n."] == ("s", "iy", "eh", "n", "eh", "n")
    # noise words and the mm/unk extras
    assert lex.pron["[laughter]"] == ("laughter",)
    assert lex.pron["mm"] == ("m",)
    assert lex.pron["<unk>"] == ("oov",)
    # true OOV reported with its count
    assert oov == {"zzyzx": 1}
    # vocabulary-limited: cmudict words not in the text are absent
    assert "n." not in lex.pron
    mapped = apply_oov(text, lex)
    assert mapped["u1"][-1] == "<unk>"
    assert mapped["u2"] == ["um", "mm", "so"]


# ---------------------------------------------------------------------------
# Mixer 6
# ---------------------------------------------------------------------------

@pytest.fixture
def mx6_dir(tmp_path):
    root = tmp_path / "LDC2013S03"
    docs = root / "mx6_speech" / "docs"
    docs.mkdir(parents=True)
    (docs / "mx6_subjs.csv").write_text(
        "subj_id,sex,other\n120345,F,x\n120346,M,x\n120347,M,x\n"
    )
    (docs / "mx6_ivcomponents.csv").write_text(
        "20100113_134557_LDC_120345,a,b,c,d,e,f,240.0,1140.5\n"
        "20100114_091122_LDC_120346,a,b,c,d,e,f,300.0,900.0\n"
    )
    (docs / "mx6_calls.csv").write_text(
        "4093,20100201_101500,x,x,120345,a,b,c,d,e,f,g,120347,h\n"
        "9999,20100202_101500,x,x,120345,a,b,c,d,e,f,g,120346,h\n"
    )
    for ch in ("02", "04"):
        d = root / "mx6_speech" / "data" / "pcm_flac" / f"CH{ch}"
        d.mkdir(parents=True)
        (d / f"20100113_134557_LDC_120345_CH{ch}.flac").write_bytes(b"fLaC")
        if ch == "04":
            (d / f"20100114_091122_LDC_120346_CH{ch}.flac").write_bytes(b"fLaC")
    sphd = root / "mx6_speech" / "data" / "ulaw_sphere"
    sphd.mkdir(parents=True)
    (sphd / "20100201_101500_4093.sph").write_bytes(b"NIST_1A\n")
    return str(root)


def test_walk_mx6_mic(mx6_dir):
    ds = walk_mx6_mic(mx6_dir, "02")
    assert len(ds) == 1  # only the session with CH02 flac present
    u = ds["120345_MX6_20100113_134557_02"]
    assert u.spk_id == "120345"
    assert (u.start, u.end) == (240.0, 1140.5)
    assert u.get_meta("gender") == "f"
    assert u.get_meta("codec") == "flac"
    with pytest.raises(ValueError):
        walk_mx6_mic(mx6_dir, "01")  # excluded lapel channel


def test_walk_mx6_calls(mx6_dir):
    ds = walk_mx6_calls(mx6_dir)
    # call 9999 has no sphere file -> skipped; call 4093 yields 2 sides
    assert sorted(ds.utt_ids) == [
        "120345_MX6_4093_A", "120347_MX6_4093_B"
    ]
    a = ds["120345_MX6_4093_A"]
    b = ds["120347_MX6_4093_B"]
    assert (a.get_meta("channel"), b.get_meta("channel")) == ("1", "2")
    assert a.get_meta("codec") == "sph"
    assert b.get_meta("gender") == "m"


def test_prep_asr_cli_roundtrip(fisher_dir, tmp_path):
    """prep-asr writes Kaldi artifacts that dataset_from_kaldi_dir +
    load_transcripts/load_lexicon read back (the --train-data/--text/
    --lexicon feed for v3/v4/v5)."""
    from sepi_tpu.cli import load_lexicon, load_transcripts, main
    from sepi_tpu.data.corpora import dataset_from_kaldi_dir

    cmu = tmp_path / "cmudict.0.7a"
    cmu.write_text("SO  S OW1\nTHE  DH AH0\nTOPIC  T AA1 P IH0 K\n"
                   "IS  IH1 Z\nYEAH  Y AE1\nOKAY  OW2 K EY1\nI  AY1\n"
                   "THINK  TH IH1 NG K\n")
    out = tmp_path / "prep"
    rc = main(["prep-asr", "--fisher-dir", fisher_dir,
               "--cmudict", str(cmu), "--out-dir", str(out)])
    assert rc == 0
    ds = dataset_from_kaldi_dir(str(out / "train_asr"))
    assert len(ds) == 3
    u = ds["fe_03_00004-A-000738-000878"]
    assert u.get_meta("codec") == "sph" and u.get_meta("channel") == "1"
    assert u.recording == "fe_03_00004-A" and u.start == 7.38
    text = load_transcripts(str(out / "train_asr" / "text"))
    # "an-" is OOV -> <unk>; rest resolved via cmudict
    assert text["fe_03_00004-A-000738-000878"] == ["<unk>", "so", "the", "topic", "is"]
    lex = load_lexicon(str(out / "lexicon.txt"))
    assert lex.pron["topic"] == ("t", "aa", "p", "ih", "k")
    assert lex.pron["[laughter]"] == ("laughter",)
    oov = (out / "oov_counts.txt").read_text()
    assert "an-" in oov


def test_walk_mx6_combined(mx6_dir):
    ds = walk_mx6(mx6_dir, mic_channels=("02", "04"), mic_subset=1)
    ids = set(ds.utt_ids)
    # all of mic 02, 1-utt subset of mic 04, both call sides
    assert "120345_MX6_20100113_134557_02" in ids
    assert "120345_MX6_4093_A" in ids and "120347_MX6_4093_B" in ids
    assert len([i for i in ids if i.endswith("_04")]) == 1
    assert ds.name == "mx6"
