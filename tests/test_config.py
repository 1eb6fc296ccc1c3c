"""Config/CLI: reference-style flags map onto the dataclasses, JSON
round-trips, derived shapes."""

from cvc_tpu.config import Config, config_from_args


def test_defaults_parse():
    cfg = config_from_args([])
    assert cfg.data.dataset == "flickr30k"
    assert cfg.model.seq_length == 20
    assert cfg.model.max_tokens == 22
    assert cfg.train.enable_cycle is True


def test_reference_flags_map():
    cfg = config_from_args([
        "--dataset", "synthetic", "--batch_size", "16", "--beam_size", "7",
        "--seq_length", "12", "--rnn_size", "256", "--enable_cycle", "0",
        "--mGPUs", "4", "--model_axis", "2", "--start_from", "/tmp/x",
        "--language_eval", "0", "--num_props", "50", "--use_pallas", "1",
        "--dtype", "bfloat16", "--self_critical_after", "10",
        "--scheduled_sampling_start", "5",
    ])
    assert cfg.data.batch_size == 16
    assert cfg.eval.beam_size == 7
    assert cfg.model.seq_length == 12
    assert cfg.model.num_regions == 56  # rounded up to a multiple of 8
    assert cfg.model.rnn_size == 256
    assert cfg.train.enable_cycle is False
    assert cfg.train.num_devices == 4 and cfg.train.model_axis == 2
    assert cfg.train.start_from == "/tmp/x"
    assert cfg.train.language_eval is False
    assert cfg.model.use_pallas is True and cfg.model.dtype == "bfloat16"
    assert cfg.train.self_critical_after == 10
    assert cfg.train.scheduled_sampling_start == 5


def test_anet_defaults():
    cfg = config_from_args(["--dataset", "anet"])
    assert cfg.model.num_frames == 10
    assert cfg.model.global_feat_dim == 3072


def test_json_roundtrip():
    cfg = config_from_args(["--rnn_size", "333", "--batch_size", "9"])
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.model.rnn_size == 333
    assert cfg2.data.batch_size == 9
    assert cfg2.to_json() == cfg.to_json()


def test_preset_configs_load():
    import glob
    names = glob.glob("configs/*.json")
    assert len(names) >= 5
    for n in names:
        c = Config.from_json(open(n).read())
        assert c.model.seq_length > 0
