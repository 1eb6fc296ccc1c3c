"""User-migration dress rehearsal (end-to-end, public CLIs only).

A reference user holds: a GVD-vintage feature dump + annotations, and a
`.pth` checkpoint written by the reference's `main.py` (torch.save of an
AttModel state_dict — SURVEY.md §3.5).  The promised migration path:

    convert_gvd_data -> build_vocab                   (data, done once)
    tools/import_torch_checkpoint.py  .pth -> .npz    (weights)
    eval.py  --import_torch                           (baseline metrics)
    train.py --import_torch                           (fine-tune on TPU)
    eval.py  --start_from                             (improved metrics)

This test runs that exact chain in a tmpdir with a reference-shaped
torch fixture model (tests/test_torch_import.RefTorchModel — independent
torch implementation, GVD-lineage state_dict names) and asserts the
fine-tune IMPROVES the imported checkpoint's caption metrics.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

from tests.test_torch_import import RefTorchModel  # noqa: E402

ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def _run(cmd):
    r = subprocess.run([sys.executable, *cmd], capture_output=True,
                       text=True, cwd=".", env=ENV)
    assert r.returncode == 0, f"{cmd[:2]} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def _eval_metrics(stdout: str) -> dict:
    """eval.py ends by printing the metrics dict as indented JSON."""
    lines = stdout.splitlines()
    start = max(i for i, ln in enumerate(lines) if ln.startswith("{"))
    return json.loads("\n".join(lines[start:]))


def _make_gvd_world(tmp_path):
    """GVD-vintage fixture dump (flat '<id>_features' HDF5 + raw
    annotation list), mirroring tests/test_tools.py's rehearsal world."""
    rng = np.random.default_rng(0)
    n_train, n_val, R, D = 12, 4, 8, 32
    names = ["dog", "cat", "horse"]
    src_h5 = str(tmp_path / "src.h5")
    src_images = []
    with h5py.File(src_h5, "w") as f:
        for i in range(n_train + n_val):
            img = f"im{i}"
            f.create_dataset(f"{img}_features",
                             data=rng.normal(size=(R, D)).astype(np.float32))
            boxes = np.zeros((R, 4), np.float32)
            boxes[:, 0] = rng.uniform(0, 200, R)
            boxes[:, 1] = rng.uniform(0, 150, R)
            boxes[:, 2] = boxes[:, 0] + rng.uniform(20, 100, R)
            boxes[:, 3] = boxes[:, 1] + rng.uniform(20, 100, R)
            f.create_dataset(f"{img}_boxes", data=boxes)
            f.create_dataset(f"{img}_classes",
                             data=rng.integers(0, 3, R).astype(np.int32))
            cname = names[i % 3]
            src_images.append({
                "id": img, "split": "train" if i < n_train else "val",
                "width": 320, "height": 240,
                "captions": [f"a {cname} in the park",
                             f"the {cname} is running"],
                "entities": [{"caption_idx": 0, "word_idx": 1,
                              "class": cname,
                              "box": [10.0, 10.0, 120.0, 100.0]}]})
    src_json = str(tmp_path / "src.json")
    json.dump(src_images, open(src_json, "w"))

    out_h5 = str(tmp_path / "feats.h5")
    out_json = str(tmp_path / "ann.json")
    _run(["tools/convert_gvd_data.py", "--src_features", src_h5,
          "--src_annotations", src_json, "--out_features", out_h5,
          "--out_annotations", out_json])
    vocab_json = str(tmp_path / "vocab.json")
    _run(["tools/build_vocab.py", "--annotation_file", out_json,
          "--out", vocab_json, "--min_count", "1"])
    return out_h5, out_json, vocab_json, D


def test_migration_chain_import_eval_finetune_improves(tmp_path):
    out_h5, out_json, vocab_json, D = _make_gvd_world(tmp_path)

    # --- the user's reference checkpoint: torch AttModel state_dict ---
    V, E, H, A = 128, 16, 32, 24   # V = vocab padded to 128 (importer pads)
    tm = RefTorchModel(V, E, H, A, D)
    pth = str(tmp_path / "model-best.pth")
    torch.save(tm.state_dict(), pth)

    # --- target config JSON (what the user writes once for cvc_tpu) ---
    from cvc_tpu.config import Config
    cfg = Config()
    cfg.data.dataset = "flickr30k"
    cfg.data.feature_file = out_h5
    cfg.data.annotation_file = out_json
    cfg.data.vocab_file = vocab_json
    cfg.data.batch_size = 4
    m = cfg.model
    m.vocab_size = V
    m.seq_length = 8
    m.num_regions = 8
    m.feat_dim = D
    m.rnn_size = H
    m.input_encoding_size = E
    m.att_hid_size = A
    m.num_classes = 8
    m.class_emb_dim = 8
    m.drop_prob_lm = 0.0
    m.use_pallas = False
    m.dtype = "float32"
    cfg_json = str(tmp_path / "config.json")
    open(cfg_json, "w").write(cfg.to_json())

    # --- 1. convert the .pth ---
    npz = str(tmp_path / "imported.npz")
    out = _run(["tools/import_torch_checkpoint.py", "--ckpt", pth,
                "--config_json", cfg_json, "--out", npz])
    assert "ckpt keys mapped" in out
    report = json.load(open(npz + ".report.json"))
    assert not report["unmapped"]

    # --- 2. baseline metrics of the imported checkpoint ---
    eval_flags = ["--config_json", cfg_json, "--split", "val",
                  "--sample_method", "greedy", "--beam_size", "1",
                  "--language_eval", "1", "--grounding_eval", "0"]
    out = _run(["eval.py", "--import_torch", npz, *eval_flags,
                "--out_dir", str(tmp_path / "eval0")])
    before = _eval_metrics(out)
    assert "CIDEr" in before and before["n_images"] == 4

    # --- 3. fine-tune from the import through train.py ---
    ckpt = str(tmp_path / "ckpt")
    _run(["train.py", "--config_json", cfg_json, "--import_torch", npz,
          "--num_devices", "1",
          "--checkpoint_path", ckpt, "--max_epochs", "60",
          "--learning_rate", "5e-3", "--val_every_epoch", "60",
          "--save_checkpoint_every", "60", "--language_eval", "1",
          "--grounding_eval", "0", "--beam_size", "1", "--id", "mig"])

    # --- 4. metrics after fine-tuning ---
    out = _run(["eval.py", "--start_from", ckpt, *eval_flags,
                "--out_dir", str(tmp_path / "eval1")])
    after = _eval_metrics(out)

    # the fine-tune must lift caption quality over the raw import
    assert after["CIDEr"] >= before["CIDEr"]
    assert after["Bleu_1"] > before["Bleu_1"]
    assert after["Bleu_1"] > 0.3, (before, after)
