"""The experiment driver: epoch loop, periodic eval, checkpointing, resume.

This is the reference's `main.py` rebuilt (reference: main()/train()/eval()
orchestration; SURVEY.md §2 'Experiment driver', §3.1): build data + model
+ optimizer, run the jitted train step over epochs, periodically score the
val split (language + grounding), checkpoint every epoch with best-CIDEr
retention, and resume from --start_from.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from cvc_tpu.config import Config
from cvc_tpu.data.datasets import load_dataset
from cvc_tpu.data.pipeline import make_batches, num_batches
from cvc_tpu.evaluation.evaluator import evaluate_split
from cvc_tpu.models import core
from cvc_tpu.parallel.mesh import make_mesh, shard_batch
from cvc_tpu.training.checkpoint import CheckpointManager, save_config
from cvc_tpu.training.optimizer import make_optimizer
from cvc_tpu.training.step import make_train_step, state_shardings
from cvc_tpu.training.train_state import TrainState
from cvc_tpu.utils.logging import MetricLogger


def cycle_stage(t_cfg, m_cfg, epoch: int) -> tuple:
    """(cycle_on, gt_queries, cycle_weight) for this epoch.

    --cycle_after stages the cycle in after decoder pretraining;
    --cycle_gt_until additionally runs its first epochs with GT-word
    localizer queries (cold-start bootstrap); --cycle_weight_anneal_to /
    --cycle_weight_anneal_after switch the reconstruction weight after
    lock-in (full-weight reconstruction XE can over-constrain the shared
    decoder — video width ablation, s57 postmortem).  Each distinct
    stage tuple compiles one step-fn variant.
    """
    cycle_on = t_cfg.enable_cycle and epoch >= t_cfg.cycle_after
    gt_q = bool(m_cfg.cycle_localize_gt) or (
        cycle_on and epoch < t_cfg.cycle_gt_until)
    cw = m_cfg.cycle_weight
    if (t_cfg.cycle_weight_anneal_to >= 0
            and epoch >= t_cfg.cycle_weight_anneal_after):
        cw = t_cfg.cycle_weight_anneal_to
    return cycle_on, (cycle_on and gt_q), cw


def _finalize_model_config(cfg: Config, ds) -> None:
    """Derive static model dims from the dataset (vocab padded to a
    multiple of 128 so the head matmul tiles the MXU)."""
    cfg.model.vocab_size = ds.vocab.padded_size(128)
    if ds.class_names:
        cfg.model.num_classes = max(cfg.model.num_classes,
                                    len(ds.class_names))


def train(cfg: Config, max_epochs: int | None = None,
          log_dir: str | None = None) -> dict:
    """Run training per Config; returns summary infos (incl. best CIDEr)."""
    t_cfg, m_cfg = cfg.train, cfg.model
    train_ds = load_dataset(cfg.data, m_cfg, "train")
    val_ds = load_dataset(cfg.data, m_cfg, "val")
    _finalize_model_config(cfg, train_ds)

    n_dev = t_cfg.num_devices or len(jax.devices())
    n_dev = min(n_dev, len(jax.devices()))
    use_mesh = n_dev > 1 or t_cfg.model_axis > 1
    mesh = make_mesh(n_dev, t_cfg.model_axis) if use_mesh else None

    steps_per_epoch = max(num_batches(train_ds, cfg.data.batch_size), 1)
    optimizer = make_optimizer(t_cfg, steps_per_epoch)
    params = core.init_params(jax.random.PRNGKey(t_cfg.seed), m_cfg)
    if getattr(t_cfg, "import_torch", None):
        # warm-start from a reference-lineage torch checkpoint (or a
        # pre-converted .npz); fresh optimizer state
        from cvc_tpu.models.torch_import import import_params
        params, report = import_params(t_cfg.import_torch, m_cfg)
        print(f"imported params from {t_cfg.import_torch} "
              f"({len(report.get('mapped', []))} keys)", flush=True)
    state = TrainState.create(params, optimizer)

    ckpt = CheckpointManager(t_cfg.checkpoint_path)
    infos = {"epoch": 0, "best_cider": -1.0, "best_step": -1}
    resume_dir = t_cfg.start_from
    if (resume_dir is None and getattr(t_cfg, "auto_resume", False)
            and ckpt.latest_step() is not None):
        resume_dir = t_cfg.checkpoint_path  # crash recovery: pick up
    if resume_dir:
        resume = (ckpt if resume_dir == t_cfg.checkpoint_path
                  else CheckpointManager(resume_dir))
        state, infos = resume.restore(state)
        print(f"resumed from {resume_dir} @ step {int(state.step)} "
              f"(epoch {infos.get('epoch', '?')})", flush=True)
    save_config(t_cfg.checkpoint_path, cfg)

    example = None
    if mesh is not None:
        for b in make_batches(train_ds, m_cfg, cfg.data.batch_size,
                              prefetch=0,
                              with_gt_region=(
                                  m_cfg.attn_supervision_weight > 0)):
            example = b.model_inputs()
            break
        state = jax.device_put(state, state_shardings(mesh, state))

    from dataclasses import replace as _dc_replace
    step_fns = {}

    def _cycle_stage(epoch: int):
        return cycle_stage(t_cfg, m_cfg, epoch)

    def get_step_fn(stage):
        """One compiled variant per (cycle_on, gt_queries, cw) stage."""
        if stage not in step_fns:
            cycle_on, gt_q, cw = stage
            tc = _dc_replace(t_cfg, enable_cycle=cycle_on)
            mc = _dc_replace(m_cfg, cycle_localize_gt=gt_q,
                             cycle_weight=cw)
            step_fns[stage] = make_train_step(
                mc, tc, optimizer, mesh=mesh, state=state,
                example_arrays=example)
        return step_fns[stage]

    step_fn = get_step_fn(_cycle_stage(0))

    # Device-resident feeding (HBM-sized datasets; also the workaround for
    # this sandbox's per-upload host leak).  Composes with the mesh (each
    # device holds its own HBM shard and gathers locally under shard_map —
    # ShardedDeviceDataset), with scheduled sampling (ss_prob rides the
    # resident step), and with SCST (sampler + PG update gather from HBM,
    # sharded or not; only tokens/rewards visit the host).
    resident = cfg.data.device_resident
    dd = resident_steps = None
    if resident:
        from cvc_tpu.data.device_data import (DeviceDataset,
                                              ShardedDeviceDataset)
        from cvc_tpu.training.step import make_resident_train_step
        with_gt = m_cfg.attn_supervision_weight > 0
        dd = (ShardedDeviceDataset(train_ds, m_cfg, mesh,
                                   with_gt_region=with_gt)
              if mesh is not None
              else DeviceDataset(train_ds, m_cfg, with_gt_region=with_gt))
        resident_steps = {}

        def get_resident_step(stage):
            if stage not in resident_steps:
                cycle_on, gt_q, cw = stage
                tc = _dc_replace(t_cfg, enable_cycle=cycle_on)
                mc = _dc_replace(m_cfg, cycle_localize_gt=gt_q,
                                 cycle_weight=cw)
                resident_steps[stage] = make_resident_train_step(
                    mc, tc, optimizer, mesh=mesh, state=state)
            return resident_steps[stage]

    logger = MetricLogger(log_dir or f"{t_cfg.checkpoint_path}/logs")
    rng = jax.random.PRNGKey(t_cfg.seed + 1)
    epochs = max_epochs if max_epochs is not None else t_cfg.max_epochs
    start_epoch = int(infos.get("epoch", 0))

    use_ss = t_cfg.scheduled_sampling_start >= 0
    scst = None  # built lazily at the first SCST epoch
    py_step = int(state.step)  # host-side mirror; avoids device syncs
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        n_tokens = 0
        ss_prob = None
        if use_ss:
            # reference annealing: +increase_prob every increase_every
            # epochs after scheduled_sampling_start, capped at max_prob
            frac = max(epoch - t_cfg.scheduled_sampling_start, 0) \
                // max(t_cfg.scheduled_sampling_increase_every, 1)
            ss_prob = jnp.asarray(
                min(t_cfg.scheduled_sampling_increase_prob * frac,
                    t_cfg.scheduled_sampling_max_prob), jnp.float32)
        stage = _cycle_stage(epoch)
        step_fn = get_step_fn(stage)
        use_scst = (t_cfg.self_critical_after >= 0
                    and epoch >= t_cfg.self_critical_after)
        cycle_on = stage[0]
        if use_scst and (scst is None
                         or scst["cycle_stage"] != (cycle_on, stage[2])):
            # reference: switch to SCST after --self_critical_after epochs.
            # The XE blend follows the same --cycle_after staging as the
            # XE loop; rebuilt if the stage flips mid-SCST (rare).
            from cvc_tpu.training.scst import (ScstRewarder,
                                               make_resident_scst_sampler,
                                               make_scst_sampler,
                                               make_scst_step,
                                               scst_train_batch,
                                               scst_train_batch_resident)
            train_refs = {train_ds.get(i).image_id: train_ds.get(i).captions
                          for i in range(len(train_ds))}
            rewarder = scst["rewarder"] if scst else ScstRewarder(train_refs)
            scst = {
                "sampler": (make_resident_scst_sampler(m_cfg,
                                                       m_cfg.seq_length,
                                                       mesh=mesh,
                                                       state=state)
                            if resident
                            else make_scst_sampler(m_cfg,
                                                   m_cfg.seq_length)),
                "step": make_scst_step(_dc_replace(m_cfg,
                                                   cycle_weight=stage[2]),
                                       t_cfg, optimizer,
                                       xe_weight=t_cfg.scst_xe_weight,
                                       enable_cycle=cycle_on, mesh=mesh,
                                       state=state, example_arrays=example,
                                       resident=resident),
                "rewarder": rewarder,
                "run": (scst_train_batch_resident if resident
                        else scst_train_batch),
                "cycle_stage": (cycle_on, stage[2]),
            }
        if resident:
            r_step = get_resident_step(stage)
            for idx in dd.epoch_batches(cfg.data.batch_size,
                                        seed=cfg.data.seed + epoch):
                if use_scst:
                    rng, sub = jax.random.split(rng)
                    state, metrics = scst["run"](
                        state, dd, idx, train_ds, scst["sampler"],
                        scst["step"], scst["rewarder"], sub)
                elif use_ss:
                    state, metrics = r_step(state, dd.data,
                                            jnp.asarray(idx), rng, ss_prob)
                else:
                    state, metrics = r_step(state, dd.data,
                                            jnp.asarray(idx), rng)
                py_step += 1
                n_tokens += dd.batch_tokens(idx)
                if py_step % t_cfg.losses_log_every == 0:
                    logger.log(py_step, metrics, prefix="train")
        else:
            for batch in make_batches(train_ds, m_cfg, cfg.data.batch_size,
                                      shuffle=cfg.data.shuffle,
                                      seed=cfg.data.seed + epoch,
                                      prefetch=cfg.data.prefetch,
                                      num_workers=cfg.data.num_workers,
                                      with_gt_region=(
                                          m_cfg.attn_supervision_weight > 0)):
                arrays = batch.model_inputs()
                arrays = (shard_batch(mesh, arrays) if mesh is not None
                          else jax.device_put(arrays))
                if use_scst:
                    rng, sub = jax.random.split(rng)
                    state, metrics = scst["run"](
                        state, arrays, batch, train_ds, scst["sampler"],
                        scst["step"], scst["rewarder"], sub)
                elif use_ss:
                    state, metrics = step_fn(state, arrays, rng, ss_prob)
                else:
                    state, metrics = step_fn(state, arrays, rng)
                py_step += 1
                n_tokens += float(batch.token_mask.sum())
                if py_step % t_cfg.losses_log_every == 0:
                    logger.log(py_step, metrics, prefix="train")
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        logger.log(int(state.step),
                   {"epoch": epoch, "sec": dt,
                    "tokens_per_sec": n_tokens / max(dt, 1e-9)},
                   prefix="speed")

        val_metrics = {}
        if (epoch + 1) % t_cfg.val_every_epoch == 0:
            if t_cfg.language_eval or t_cfg.grounding_eval:
                e_cfg = cfg.eval
                beam = t_cfg.beam_size or e_cfg.beam_size
                from dataclasses import replace
                val_eval_cfg = replace(e_cfg, beam_size=beam,
                                       sample_method="beam" if beam > 1
                                       else "greedy",
                                       max_length=m_cfg.seq_length,
                                       language_eval=t_cfg.language_eval,
                                       grounding_eval=t_cfg.grounding_eval)
                # with a mesh the decode runs data-parallel on the slice
                # (params stay in their training placement, batches shard
                # over 'data'); single-device keeps the host-copy path
                eval_params = (state.params if mesh is not None
                               else _host_params(state))
                val_metrics = evaluate_split(
                    eval_params, m_cfg, val_eval_cfg, val_ds,
                    cfg.data.batch_size, mesh=mesh)
                if t_cfg.cycle_probes:
                    from cvc_tpu.evaluation.probes import \
                        cycle_probe_metrics
                    val_metrics.update(cycle_probe_metrics(
                        eval_params, m_cfg, val_ds,
                        cfg.data.batch_size, mesh=mesh))
                logger.log(int(state.step), val_metrics, prefix="val")
            cider = float(val_metrics.get("CIDEr") or 0.0)
            if cider > infos["best_cider"]:
                infos["best_cider"] = cider
                infos["best_step"] = int(state.step)

        infos["epoch"] = epoch + 1
        if (epoch + 1) % t_cfg.save_checkpoint_every == 0:
            ckpt.save(int(state.step), _host_state(state), infos,
                      metrics=val_metrics)
    ckpt.wait()
    logger.close()
    infos["final_step"] = int(state.step)
    return infos


def _host_params(state: TrainState):
    """Fully-replicated host copy of the params (for eval/decode which is
    compiled without mesh shardings)."""
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x)),
                                  state.params)


def _host_state(state: TrainState) -> TrainState:
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), state)
