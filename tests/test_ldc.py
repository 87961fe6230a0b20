"""LDC corpus walkers against synthetic fixture trees reproducing the
documented distribution layouts (make_sre.pl / make_sre10.pl /
make_sre16_eval.pl / make_swbd_cellular1.pl / make_musan.py)."""

import os

import pytest

from sepi_tpu.data import ldc


def _touch(path, content=""):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def test_walk_sre(tmp_path):
    db = tmp_path / "LDC2006S44"
    for seg in ["xaaa", "xbbb", "xccc"]:
        _touch(str(db / "data" / f"{seg}.sph"), "fake")
    ref = tmp_path / "sre_ref"
    _touch(str(ref), "\n".join([
        "1001 f sre2004 xaaa A",
        "1001 f sre2004 xaaa B",
        "1002 m sre2004 xbbb B",
        "1003 m sre2005 xccc A",   # wrong year: dropped
        "1004 m sre2004 zzzz A",   # missing sph: dropped
    ]))
    ds = ldc.walk_sre(str(db), "04", str(ref))
    assert set(ds.utt_ids) == {
        "1001-sre04-xaaa-a", "1001-sre04-xaaa-b", "1002-sre04-xbbb-b",
    }
    u = ds["1001-sre04-xaaa-b"]
    assert u.spk_id == "1001"
    assert u.get_meta("channel") == "2" and u.get_meta("gender") == "f"
    assert u.wav.endswith("xaaa.sph")


def test_walk_sre08(tmp_path):
    test_db = tmp_path / "LDC2011S08"
    train_db = tmp_path / "LDC2011S05"
    for seg in ["tseg1", "tseg2"]:
        _touch(str(test_db / "data" / f"{seg}.sph"))
    _touch(str(train_db / "data" / "eseg1.sph"))
    keys = test_db / "data" / "keys" / "NIST_SRE08_KEYS.v0.1"
    _touch(str(keys / "model-keys" / "NIST_SRE08_short2.model.key"), "\n".join([
        "m1,f,eseg1:a,9001",
        "m2,m,missing:b,9002",      # enroll sph absent: enroll utt dropped
    ]))
    _touch(str(keys / "trial-keys" / "NIST_SRE08_short2-short3.trial.key"),
           "\n".join([
               "m1,tseg1,a,target,x",
               "m1,tseg2,b,nontarget,x",  # nontarget: dropped
               "m2,tseg2,b,target,x",     # model's enroll missing, sid known
               "m9,tseg1,b,target,x",     # unknown model: dropped
           ]))
    ds = ldc.walk_sre08(str(test_db), str(train_db))
    assert set(ds.utt_ids) == {
        "9001_SRE08_eseg1_A", "9001_SRE08_tseg1_A", "9002_SRE08_tseg2_B",
    }
    u = ds["9001_SRE08_eseg1_A"]
    assert u.spk_id == "9001"
    assert u.get_meta("channel") == "1" and u.get_meta("gender") == "f"
    assert ds["9002_SRE08_tseg2_B"].get_meta("gender") == "m"


def test_walk_sre10(tmp_path):
    db = tmp_path / "sre10"
    for seg in ["seg1", "seg2"]:
        _touch(str(db / "data" / f"{seg}.sph"))
    _touch(str(db / "train" / "coreext.trn"), "")
    _touch(str(db / "keys" / "coreext.modelkey.csv"),
           "m1,5555\nm2,NOT_SCORED\nm3,6666\n")
    _touch(str(db / "keys" / "coreext-coreext.trialkey.csv"), "\n".join([
        "m1,seg1,a,target,x",
        "m1,seg2,b,nontarget,x",   # nontarget: dropped
        "m2,seg2,a,target,x",      # NOT_SCORED model: dropped
        "m3,seg2,b,target,x",
    ]))
    ds = ldc.walk_sre10(str(db))
    assert set(ds.utt_ids) == {"5555_SRE10_seg1_A", "6666_SRE10_seg2_B"}
    assert ds["6666_SRE10_seg2_B"].get_meta("channel") == "2"


def test_walk_sre16_eval(tmp_path):
    db = tmp_path / "R149"
    _touch(str(db / "data" / "enrollment" / "enr1.sph"))
    _touch(str(db / "data" / "test" / "tst1.sph"))
    _touch(str(db / "data" / "test" / "tst2.sph"))
    _touch(str(db / "docs" / "sre16_eval_enrollment.tsv"),
           "modelid segment\nspkA enr1\n")
    _touch(str(db / "docs" / "sre16_eval_segment_key.tsv"),
           "segment callid\ntst1 c1\ntst2 c2\n")
    _touch(str(db / "metadata" / "calls.tsv"), "c1 tgl\nc2 yue\nsegment x\n")
    _touch(str(db / "docs" / "sre16_eval_trial_key.tsv"), "\n".join([
        "modelid segment side targettype",
        "spkA tst1 a target",
        "spkA tst2 a nontarget",
    ]))
    enroll, test, trials = ldc.walk_sre16_eval(str(db))
    assert enroll.utt_ids == ("spkA-enr1",) or list(enroll.utt_ids) == ["spkA-enr1"]
    assert set(test.utt_ids) == {"tst1", "tst2"}
    assert test["tst1"].get_meta("lang") == "tgl"
    assert len(trials["pooled"]) == 2
    assert [t.test for t in trials["tgl"]] == ["tst1"]
    assert [t.test for t in trials["yue"]] == ["tst2"]
    assert trials["tgl"][0].target and not trials["yue"][0].target


def test_walk_sre16_unlabeled(tmp_path):
    db = tmp_path / "R150"
    _touch(str(db / "data" / "unlabeled" / "major" / "a.sph"))
    _touch(str(db / "data" / "unlabeled" / "major" / "b.sph"))
    _touch(str(db / "data" / "unlabeled" / "minor" / "c.sph"))
    major, minor = ldc.walk_sre16_unlabeled(str(db))
    assert set(major.utt_ids) == {"a", "b"} and set(minor.utt_ids) == {"c"}


def test_walk_swbd_cellular(tmp_path):
    db = tmp_path / "LDC2001S13"
    _touch(str(db / "doc" / "swb_callstats.tbl"), "\n".join([
        "40000,1111,2222,M,F",
        "40019,3333,4444,M,M",  # bad-audio skip list
        "40001,1111,5555,M,F",  # reuses speaker 1111
    ]))
    for w in ["40000", "40019", "40001"]:
        _touch(str(db / f"sw_{w}.sph"))
    ds = ldc.walk_swbd_cellular(str(db))
    assert set(ds.utt_ids) == {
        "sw_1111-swbdc_sw_40000_1", "sw_2222-swbdc_sw_40000_2",
        "sw_1111-swbdc_sw_40001_1", "sw_5555-swbdc_sw_40001_2",
    }
    assert ds["sw_2222-swbdc_sw_40000_2"].get_meta("gender") == "f"
    assert len(ds.spk2utt["sw_1111"]) == 2


def test_walk_swbd_cellular_bad_gender_raises(tmp_path):
    db = tmp_path / "bad"
    _touch(str(db / "doc" / "swb_callstats.tbl"), "40000,1,2,M,X\n")
    _touch(str(db / "sw_40000.sph"))
    with pytest.raises(ValueError, match="gender"):
        ldc.walk_swbd_cellular(str(db))


def test_walk_swbd2_phase(tmp_path):
    db = tmp_path / "LDC99S79"
    _touch(str(db / "DISC1" / "doc" / "callstat.tbl"),
           "x,x,1111,2222,M,F\nx,x,3333,4444,F,M\n")
    # two callinfo rows per call; the SECOND carries the conversation id
    _touch(str(db / "DISC1" / "doc" / "callinfo.tbl"), "\n".join([
        "ignored_a,1", "20001,2", "ignored_b,1", "20002,2", ""
    ]))
    _touch(str(db / "DISC1" / "20001.sph"))
    _touch(str(db / "DISC2" / "20002.sph"))
    ds = ldc.walk_swbd2_phase(str(db))
    assert set(ds.utt_ids) == {
        "sw_1111_20001_1", "sw_2222_20001_2",
        "sw_3333_20002_1", "sw_4444_20002_2",
    }
    assert ds["sw_3333_20002_1"].get_meta("gender") == "f"


def test_walk_musan(tmp_path):
    root = tmp_path / "musan"
    _touch(str(root / "music" / "fma" / "music-fma-0001.wav"))
    _touch(str(root / "music" / "fma" / "music-fma-0002.wav"))
    _touch(str(root / "music" / "fma" / "ANNOTATIONS"),
           "music-fma-0001 rock Y artist1\nmusic-fma-0002 jazz N artist2\n")
    _touch(str(root / "speech" / "us-gov" / "speech-us-gov-0001.wav"))
    _touch(str(root / "noise" / "free-sound" / "noise-free-sound-0001.wav"))
    out = ldc.walk_musan(str(root))
    assert set(out) == {"music", "speech", "noise"}
    # vocals track excluded by default, included with use_vocals
    assert set(out["music"].utt_ids) == {"music-fma-0002"}
    out_v = ldc.walk_musan(str(root), use_vocals=True)
    assert set(out_v["music"].utt_ids) == {"music-fma-0001", "music-fma-0002"}
    assert set(out["speech"].utt_ids) == {"speech-us-gov-0001"}
    assert set(out["noise"].utt_ids) == {"noise-free-sound-0001"}
