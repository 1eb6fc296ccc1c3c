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


def test_config_json_not_clobbered_by_cli_defaults(tmp_path):
    """--config_json values survive unless the user explicitly passes the
    flag (regression: argparse defaults silently overwrote the file)."""
    base = Config()
    base.model.rnn_size = 1280
    base.model.dtype = "bfloat16"
    base.model.use_pallas = True
    base.data.batch_size = 512
    base.train.num_devices = 8
    base.train.model_axis = 2
    p = tmp_path / "cfg.json"
    p.write_text(base.to_json())

    cfg = config_from_args(["--config_json", str(p)])
    assert cfg.model.rnn_size == 1280
    assert cfg.model.dtype == "bfloat16"
    assert cfg.model.use_pallas is True
    assert cfg.data.batch_size == 512
    assert cfg.train.num_devices == 8 and cfg.train.model_axis == 2

    # explicit CLI flag still wins over the file
    cfg2 = config_from_args(["--config_json", str(p), "--batch_size", "32"])
    assert cfg2.data.batch_size == 32
    assert cfg2.model.rnn_size == 1280  # untouched fields keep JSON values


def test_shipped_presets_apply_through_cli(tmp_path):
    """Every shipped preset must be applicable via --config_json."""
    import glob
    for n in sorted(glob.glob("configs/*.json")):
        file_cfg = Config.from_json(open(n).read())
        cli_cfg = config_from_args(["--config_json", n])
        assert cli_cfg.model.rnn_size == file_cfg.model.rnn_size, n
        assert cli_cfg.model.dtype == file_cfg.model.dtype, n
        assert cli_cfg.data.batch_size == file_cfg.data.batch_size, n
        assert cli_cfg.train.num_devices == file_cfg.train.num_devices, n
        assert cli_cfg.model.use_pallas == file_cfg.model.use_pallas, n


def test_lr_schedule_reference_semantics():
    """Staircase matches GVD lineage: rate^floor((epoch-start)/every),
    active only once epoch > start; start=-1 disables decay."""
    from cvc_tpu.config import TrainConfig
    from cvc_tpu.training.optimizer import lr_schedule

    t = TrainConfig(learning_rate=1.0, learning_rate_decay_start=1,
                    learning_rate_decay_every=3,
                    learning_rate_decay_rate=0.8)
    sched = lr_schedule(t, steps_per_epoch=10)
    # epoch = step // 10
    assert float(sched(0)) == 1.0          # epoch 0: before start
    assert float(sched(10)) == 1.0         # epoch 1 == start: not yet
    assert float(sched(20)) == 1.0         # epoch 2: (2-1)//3 = 0
    assert abs(float(sched(40)) - 0.8) < 1e-6   # epoch 4: (4-1)//3 = 1
    assert abs(float(sched(70)) - 0.64) < 1e-6  # epoch 7: (7-1)//3 = 2

    t2 = TrainConfig(learning_rate=0.5, learning_rate_decay_start=-1)
    sched2 = lr_schedule(t2, steps_per_epoch=10)
    assert float(sched2(990)) == 0.5


def test_data_pipeline_flags_map():
    """--device_resident / --num_workers / --prefetch / --synthetic_* are
    reachable from the CLI (device-resident feeding is mandatory for long
    single-chip runs; see cvc_tpu/data/device_data.py)."""
    from cvc_tpu.config import config_from_args
    cfg = config_from_args([
        "--dataset", "synthetic", "--device_resident", "1",
        "--num_workers", "3", "--prefetch", "4",
        "--synthetic_num_images", "512", "--synthetic_vocab_size", "321",
        "--train_scan_unroll", "21"])
    assert cfg.data.device_resident is True
    assert cfg.data.num_workers == 3
    assert cfg.data.prefetch == 4
    assert cfg.data.synthetic_num_images == 512
    assert cfg.data.synthetic_vocab_size == 321
    assert cfg.model.train_scan_unroll == 21
