"""CLI recipe runner: Kaldi-dir in, report + artifacts out."""

import os

import numpy as np
import pytest

from sepi_tpu.cli import load_lexicon, load_transcripts, main
from sepi_tpu.data import make_synthetic_corpus
from sepi_tpu.data.audio import write_wav
from sepi_tpu.data.corpora import write_kaldi_dir
from sepi_tpu.data.manifest import save_trials


@pytest.fixture(scope="module")
def cli_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus = make_synthetic_corpus(num_speakers=5, utts_per_speaker=4, seed=41)
    wavs = root / "wavs"
    wavs.mkdir()
    utts = []
    for u in corpus.dataset:
        p = str(wavs / f"{u.utt_id}.wav")
        write_wav(p, corpus.audio[u.utt_id], 8000)
        utts.append(u.replace(wav=p))
    from sepi_tpu.data.manifest import Dataset

    ds = Dataset(utts, "cli")
    ddir = str(root / "data")
    write_kaldi_dir(ds, ddir)
    trials_path = str(root / "trials")
    save_trials(corpus.trials, trials_path)
    return root, ddir, trials_path

@pytest.mark.slow

def test_cli_v2_end_to_end(cli_world, capsys):
    root, ddir, trials = cli_world
    wd = str(root / "exp_v2")
    rc = main([
        "v2", "--train-data", ddir, "--enroll-data", ddir,
        "--trials", trials, "--workdir", wd, "--num-steps", "60",
        "--min-chunk", "50", "--max-chunk", "100", "--chunk-buckets", "2",
        "--batch-size", "16",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pooled" in out and "EER" in out
    assert os.path.exists(f"{wd}/xvector.scp")
    assert os.path.exists(f"{wd}/det_pooled.svg")
    assert os.path.exists(f"{wd}/metrics.jsonl")


def test_cli_v3_requires_text_and_lexicon(cli_world):
    root, ddir, trials = cli_world
    with pytest.raises(SystemExit, match="text"):
        main(["v3", "--train-data", ddir, "--enroll-data", ddir,
              "--trials", trials, "--workdir", str(root / "exp_v3")])


def test_cli_table_loaders(tmp_path):
    t = tmp_path / "text"
    t.write_text("utt1 hello world\nutt2 foo\n")
    tr = load_transcripts(str(t))
    assert tr == {"utt1": ["hello", "world"], "utt2": ["foo"]}
    lx = tmp_path / "lexicon.txt"
    lx.write_text("hello h eh l ow\nworld w er l d\nhello h ax l ow\n")
    lex = load_lexicon(str(lx))
    assert lex.pron["hello"] == ("h", "eh", "l", "ow")  # first pron wins
    assert "sil" == lex.phones[0]


def test_cli_loads_sphere_wav_scp(tmp_path):
    """_load_corpus must resolve sph2pipe wav.scp pipelines natively,
    honoring the 2-channel telephone-side selection (make_sre.pl form)."""
    from test_sphere import write_sph

    from sepi_tpu.cli import _load_corpus

    n = 400
    a = (np.arange(n) % 101 - 50).astype("<i2") * 100
    b = -a
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2], inter[1::2] = a, b
    sph = str(tmp_path / "rec.sph")
    write_sph(sph, inter.tobytes(), channels=2, samples=n)
    (tmp_path / "wav.scp").write_text(
        f"utt_a sph2pipe -f wav -p -c 1 {sph} |\n"
        f"utt_b sph2pipe -f wav -p -c 2 {sph} |\n")
    (tmp_path / "utt2spk").write_text("utt_a spkA\nutt_b spkB\n")
    ds, audio = _load_corpus(str(tmp_path), 8000)
    assert len(ds) == 2
    np.testing.assert_array_equal(audio["utt_a"], a.astype(np.float32))
    np.testing.assert_array_equal(audio["utt_b"], b.astype(np.float32))


def test_cli_rejects_wrong_sample_rate(cli_world):
    root, ddir, trials = cli_world
    with pytest.raises(ValueError, match="sample rate"):
        main(["v2", "--train-data", ddir, "--enroll-data", ddir,
              "--trials", trials, "--workdir", str(root / "x"),
              "--sample-rate", "16000"])

@pytest.mark.slow

def test_cli_v2_with_augmentation_dirs(cli_world, tmp_path):
    """--musan-dir/--rirs-dir load pools from wav trees and feed the
    stage-2 augmentation path."""
    import numpy as np

    from sepi_tpu.data.augment import synthetic_rir

    rng = np.random.default_rng(5)
    musan = tmp_path / "musan"
    for sub in ("noise", "music", "speech"):
        (musan / sub).mkdir(parents=True)
        for i in range(2):
            write_wav(str(musan / sub / f"{sub}{i}.wav"),
                      (rng.normal(size=(12000,)) * 900).astype(np.float32), 8000)
    rirs = tmp_path / "rirs"
    rirs.mkdir()
    write_wav(str(rirs / "rir0.wav"), synthetic_rir(seed=2) * 20000.0, 8000)

    root, ddir, trials = cli_world
    wd = str(tmp_path / "exp_aug")
    rc = main([
        "v2", "--train-data", ddir, "--enroll-data", ddir,
        "--trials", trials, "--workdir", wd, "--num-steps", "60",
        "--min-chunk", "50", "--max-chunk", "100", "--chunk-buckets", "2",
        "--batch-size", "16",
        "--musan-dir", str(musan), "--rirs-dir", str(rirs),
        "--aug-subset", "30",
    ])
    assert rc == 0
    scp = open(f"{wd}/xvector.scp").read()
    assert sum(1 for line in scp.splitlines()
               if any(k in line for k in ("-reverb", "-noise", "-music", "-babble"))) == 30


def test_cli_prep_ldc_sre08_and_sre16(tmp_path, capsys):
    """prep-ldc walks fixture LDC trees into loadable manifests + trials
    (the make_sre08.pl / make_sre16_eval.pl call-site analog)."""
    from sepi_tpu.data.manifest import Dataset, load_trials

    def touch(path, content=""):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(content)

    test_db = tmp_path / "LDC2011S08"
    train_db = tmp_path / "LDC2011S05"
    touch(str(test_db / "data" / "tseg1.sph"))
    touch(str(train_db / "data" / "eseg1.sph"))
    keys = test_db / "data" / "keys" / "NIST_SRE08_KEYS.v0.1"
    touch(str(keys / "model-keys" / "NIST_SRE08_short2.model.key"),
          "m1,f,eseg1:a,9001\n")
    touch(str(keys / "trial-keys" / "NIST_SRE08_short2-short3.trial.key"),
          "m1,tseg1,a,target,x\n")
    out08 = tmp_path / "out08"
    rc = main(["prep-ldc", "--corpus", "sre08", "--db", str(test_db),
               "--db2", str(train_db), "--out", str(out08)])
    assert rc == 0
    ds = Dataset.load(str(out08 / "sre08.jsonl"))
    assert set(ds.utt_ids) == {"9001_SRE08_eseg1_A", "9001_SRE08_tseg1_A"}
    assert ds["9001_SRE08_eseg1_A"].get_meta("gender") == "f"

    sre16 = tmp_path / "R149"
    touch(str(sre16 / "data" / "enrollment" / "enr1.sph"))
    touch(str(sre16 / "data" / "test" / "tst1.sph"))
    touch(str(sre16 / "docs" / "sre16_eval_enrollment.tsv"),
          "spkA enr1\n")
    touch(str(sre16 / "docs" / "sre16_eval_trial_key.tsv"),
          "spkA tst1 x target\n")
    touch(str(sre16 / "docs" / "sre16_eval_segment_key.tsv"), "tst1 call1\n")
    touch(str(sre16 / "metadata" / "calls.tsv"), "call1 tgl\n")
    out16 = tmp_path / "out16"
    rc = main(["prep-ldc", "--corpus", "sre16-eval", "--db", str(sre16),
               "--out", str(out16)])
    assert rc == 0
    enroll = Dataset.load(str(out16 / "sre16_eval_enroll.jsonl"))
    assert enroll.utt_ids == ["spkA-enr1"]
    trials = load_trials(str(out16 / "trials_tgl"))
    assert len(trials) == 1 and trials[0].target
