"""Preprocessing tools: vocab builder and GVD-style converter round-trip."""

import json
import subprocess
import sys

import h5py
import numpy as np

from cvc_tpu.data.datasets import load_hdf5_dataset
from cvc_tpu.data.synthetic import make_synthetic_dataset, write_fixture_files
from cvc_tpu.data.vocab import Vocabulary


def test_build_vocab_cli(tmp_path):
    ds = make_synthetic_dataset(num_images=6, num_regions=8, feat_dim=16,
                                seq_length=10, split="train", seed=0)
    ff, af, vf = (str(tmp_path / n) for n in ("f.h5", "a.json", "v.json"))
    write_fixture_files(ds, ff, af, vf)
    out = str(tmp_path / "vocab_built.json")
    r = subprocess.run(
        [sys.executable, "tools/build_vocab.py", "--annotation_file", af,
         "--out", out, "--min_count", "1"],
        capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr
    v = Vocabulary.load(out)
    assert "obj0" in v.wtoi or len(v) > 4


def test_convert_gvd_flat_layout(tmp_path):
    # fabricate a flat '<id>_features' source dump with pixel boxes
    src_h5 = str(tmp_path / "src.h5")
    with h5py.File(src_h5, "w") as f:
        f.create_dataset("img1_features", data=np.ones((5, 16), np.float32))
        f.create_dataset("img1_boxes",
                         data=np.array([[0, 0, 50, 50]] * 5, np.float32))
        f.create_dataset("img1_classes", data=np.arange(5, dtype=np.int32))
    src_ann = [{"id": "img1", "split": "train", "width": 100, "height": 100,
                "captions": ["a dog runs"],
                "entities": [{"caption_idx": 0, "word_idx": 1,
                              "class": "dog", "box": [0, 0, 50, 50]}]}]
    src_json = str(tmp_path / "src.json")
    with open(src_json, "w") as f:
        json.dump(src_ann, f)

    out_h5 = str(tmp_path / "out.h5")
    out_json = str(tmp_path / "out.json")
    r = subprocess.run(
        [sys.executable, "tools/convert_gvd_data.py",
         "--src_features", src_h5, "--src_annotations", src_json,
         "--out_features", out_h5, "--out_annotations", out_json],
        capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr

    vocab = Vocabulary.build(["a dog runs"], min_count=1)
    ds = load_hdf5_dataset(out_h5, out_json, vocab, split="train")
    assert len(ds) == 1
    ex = ds.get(0)
    np.testing.assert_allclose(ex.boxes[0], [0, 0, 0.5, 0.5])  # normalized
    assert ds.class_names == ["dog"]
    assert ex.entities[0].word_idx == 1
