"""Serving API: captioning arbitrary request batches, grounding output,
checkpoint loading."""

import jax
import numpy as np

from cvc_tpu.data.synthetic import make_synthetic_dataset
from cvc_tpu.models import core
from cvc_tpu.serving import Captioner
from tests.conftest import tiny_model_config


def test_captioner_batches_and_grounds():
    cfg = tiny_model_config(feat_dim=32, num_regions=12, seq_length=10)
    ds = make_synthetic_dataset(num_images=5, num_regions=12, feat_dim=32,
                                seq_length=10, split="val", seed=0)
    cfg.vocab_size = ds.vocab.padded_size(128)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    cap = Captioner.build(params, cfg, ds.vocab, beam_size=2, batch_size=4)

    reqs = [{"features": ds.get(i).features, "boxes": ds.get(i).boxes,
             "classes": ds.get(i).classes} for i in range(5)]  # 5 > batch 4
    out = cap.caption(reqs)
    assert len(out) == 5
    for r in out:
        assert isinstance(r["caption"], str)
        for g in r["grounding"]:
            assert len(g["box"]) == 4
            assert 0.0 <= g["weight"] <= 1.0
        assert len(r["grounding"]) == len(r["caption"].split())


def test_captioner_from_checkpoint(tmp_path):
    from cvc_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from cvc_tpu.training import TrainState, make_optimizer
    from cvc_tpu.training.checkpoint import CheckpointManager, save_config

    mc = tiny_model_config(feat_dim=32, num_regions=12, seq_length=10)
    ds = make_synthetic_dataset(num_images=4, num_regions=12, feat_dim=32,
                                seq_length=10, split="train", seed=0)
    mc.vocab_size = ds.vocab.padded_size(128)
    cfg = Config(model=mc,
                 data=DataConfig(dataset="synthetic", synthetic_num_images=4),
                 train=TrainConfig(checkpoint_path=str(tmp_path)))
    params = core.init_params(jax.random.PRNGKey(0), mc)
    opt = make_optimizer(cfg.train, 1)
    state = TrainState.create(params, opt)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(1, state, infos={}, metrics={"CIDEr": 1.0})
    mgr.wait()
    save_config(str(tmp_path), cfg)

    cap = Captioner.from_checkpoint(str(tmp_path), beam_size=1, batch_size=2)
    out = cap.caption([{"features": ds.get(0).features,
                        "boxes": ds.get(0).boxes,
                        "classes": ds.get(0).classes}])
    assert len(out) == 1 and "caption" in out[0]


def test_captioner_from_torch(tmp_path):
    """Serve a reference-lineage torch .pth directly (import bridge)."""
    import pytest
    torch = pytest.importorskip("torch")
    from cvc_tpu.config import Config
    from tests.test_torch_import import RefTorchModel

    mc = tiny_model_config(feat_dim=32, num_regions=12, seq_length=10)
    ds = make_synthetic_dataset(num_images=5, num_regions=12, feat_dim=32,
                                seq_length=10, split="val", seed=0)
    V = ds.vocab.padded_size(128)
    torch.manual_seed(0)
    tm = RefTorchModel(V, mc.input_encoding_size, mc.rnn_size,
                       mc.att_hid_size, mc.feat_dim)
    pth = str(tmp_path / "model-best.pth")
    torch.save(tm.state_dict(), pth)
    cfg = Config()
    cfg.model = mc
    cfg_json = str(tmp_path / "config.json")
    with open(cfg_json, "w") as f:
        f.write(cfg.to_json())
    vocab_file = str(tmp_path / "vocab.json")
    ds.vocab.save(vocab_file)

    cap = Captioner.from_torch(pth, cfg_json, vocab_file, beam_size=2,
                               batch_size=4)
    reqs = [{"features": ds.get(i).features, "boxes": ds.get(i).boxes,
             "classes": ds.get(i).classes} for i in range(5)]
    out = cap.caption(reqs)
    assert len(out) == 5
    for r in out:
        assert isinstance(r["caption"], str)


def test_captioner_pipeline_depth_identical_results():
    """pipeline_depth only changes submission overlap, never outputs:
    depth 1 (blocking) and depth 3 (two extra batches in flight) must
    produce identical captions, scores and grounding across a request
    list spanning several internal batches."""
    cfg = tiny_model_config(feat_dim=32, num_regions=12, seq_length=10)
    ds = make_synthetic_dataset(num_images=11, num_regions=12, feat_dim=32,
                                seq_length=10, split="val", seed=3)
    cfg.vocab_size = ds.vocab.padded_size(128)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    cap = Captioner.build(params, cfg, ds.vocab, beam_size=2, batch_size=4)
    reqs = [{"features": ds.get(i).features, "boxes": ds.get(i).boxes,
             "classes": ds.get(i).classes} for i in range(11)]
    a = cap.caption(reqs, pipeline_depth=1)
    b = cap.caption(reqs, pipeline_depth=3)
    assert len(a) == len(b) == 11
    for ra, rb in zip(a, b):
        assert ra["caption"] == rb["caption"]
        assert ra["score"] == rb["score"]
        assert ra["grounding"] == rb["grounding"]
