"""Direct coverage of the small CLI tools (parity: reference
neurst/cli/* — generate_vocab, process_text, text_metric, view_records,
avg_checkpoint, inspect_checkpoint, view_registry, audio_analysis).
The heavyweight tools (create_records, learn_bpe,
extract_audio_transcripts) are covered by tests/test_recipe_pipeline.py.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generate_vocab(tmp_path, capsys):
    from neurst_tpu.cli import generate_vocab
    corpus = tmp_path / "c.txt"
    corpus.write_text("a b b c c c\n" "c b a a\n")
    out = tmp_path / "vocab.txt"
    generate_vocab.main(["--input", str(corpus), "--output", str(out),
                         "--min_frequency", "2"])
    rows = [line.split() for line in out.read_text().splitlines()
            if line.strip()]
    tokens = [r[0] for r in rows]
    assert tokens[0] == "c"  # frequency-sorted (c appears 4x)
    assert set(tokens) == {"a", "b", "c"}


def test_process_text_roundtrip(tmp_path):
    from neurst_tpu.cli import process_text
    src = tmp_path / "in.txt"
    src.write_text("Hello, world! It's 2026.\n")
    tok = tmp_path / "tok.txt"
    process_text.main(["--tokenizer", "moses", "--language", "en",
                       "--input", str(src), "--output", str(tok)])
    tokked = tok.read_text().strip()
    assert " ," in tokked or ", " != tokked  # punctuation split
    detok = tmp_path / "detok.txt"
    process_text.main(["--tokenizer", "moses", "--language", "en",
                       "--detokenize",
                       "--input", str(tok), "--output", str(detok)])
    assert detok.read_text().strip() == "Hello, world! It's 2026."


def test_text_metric(tmp_path, capsys):
    from neurst_tpu.cli import text_metric
    hypo = tmp_path / "h.txt"
    ref = tmp_path / "r.txt"
    hypo.write_text("a b c d\ne f g h\n")
    ref.write_text("a b c d\ne f g h\n")
    text_metric.main(["--metric", "bleu", "--hypo_file", str(hypo),
                      "--ref_file", str(ref)])
    out = capsys.readouterr().out
    assert "100" in out  # perfect match


def test_view_records_and_audio_analysis(tmp_path, capsys):
    from neurst_tpu.cli import audio_analysis, view_records
    from neurst_tpu.data.recordio import RecordWriter, build_example
    rng = np.random.RandomState(0)
    rec = str(tmp_path / "x.tfrecords")
    with RecordWriter(rec) as w:
        for i in range(5):
            w.write(build_example({
                "audio": rng.randn(40 * (i + 2)).astype(np.float32),
                "transcript": rng.randint(0, 9, size=i + 2)
                .astype(np.int64)}))
    view_records.main([rec, "--count", "2"])
    out = capsys.readouterr().out
    assert "audio" in out and "transcript" in out

    audio_analysis.main([rec, "--audio_feature_dim", "8",
                         "--audio_feature_channels", "1"])
    out = capsys.readouterr().out
    assert "frame" in out.lower() or "ratio" in out.lower()


def test_avg_and_inspect_checkpoint(tmp_path, capsys):
    from neurst_tpu.cli import avg_checkpoint, inspect_checkpoint
    from neurst_tpu.utils import checkpoints as ckpt_lib
    model_dir = str(tmp_path / "m")
    for step, scale in ((10, 1.0), (20, 3.0)):
        ckpt_lib.save_checkpoint(
            model_dir, step,
            {"layer": {"w": np.full([2, 2], scale, np.float32)}})
    out_dir = str(tmp_path / "avg")
    avg_checkpoint.main(["--model_dir", model_dir, "--last_n", "2",
                         "--output_dir", out_dir])
    flat = ckpt_lib.restore_checkpoint_params(
        ckpt_lib.latest_checkpoint(out_dir))
    np.testing.assert_allclose(flat["layer/w"], 2.0)  # mean(1, 3)

    inspect_checkpoint.main([out_dir])
    out = capsys.readouterr().out
    assert "layer/w" in out and "shape=[2, 2]" in out


def test_view_registry(capsys):
    from neurst_tpu.cli import view_registry
    view_registry.main([])
    out = capsys.readouterr().out
    assert "task" in out and "model" in out
    view_registry.main(["model"])
    out = capsys.readouterr().out
    assert "transformer" in out
    view_registry.main(["model", "transformer"])
    out = capsys.readouterr().out
    assert "hidden_size" in out or "num_layers" in out


def test_convert_checkpoint_cli_neurst_transformer(tmp_path):
    """The convert_checkpoint CLI on a reference-trained TF checkpoint
    (the corpus-parity fixture) must emit an npz our tooling loads."""
    pytest.importorskip("tensorflow")
    from neurst_tpu.cli import convert_checkpoint
    from neurst_tpu.utils import checkpoints as ckpt_lib
    src = os.path.join(REPO, "tests", "fixtures", "reference_goldens",
                       "corpus_tf_ckpt")
    if not os.path.isdir(src):
        pytest.skip("corpus fixture not generated")
    out_dir = str(tmp_path / "converted")
    convert_checkpoint.main(["--converter", "neurst_transformer",
                             "--from_path", src, "--to_path", out_dir,
                             "--num_heads", "4"])
    flat = ckpt_lib.restore_checkpoint_params(
        ckpt_lib.latest_checkpoint(out_dir))
    assert any(k.startswith("encoder/layer_0/") for k in flat)
    assert any(k.startswith("target_symbol_modality") for k in flat)
