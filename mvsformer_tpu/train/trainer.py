"""Training orchestration: epoch loop, micro-batch gradient accumulation,
validation with monitored checkpointing, early stop, TB logging.

Functional spec: /root/reference/base/base_trainer.py (epoch loop, best/last
checkpoints keyed on `min mean_error`, early stop) and
trainer/mvsformer_trainer.py (per-epoch barrel reset, resolution-dependent
gradient accumulation via scale_batch_map, loss dispatch, validation metrics
with dist all-reduce). TPU differences: bf16 compute needs no GradScaler;
collectives are pmean inside the shard_map steps; one jitted executable per
(crop_h, crop_w, micro_batch) bucket.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mvsformer_tpu.config import Config
from mvsformer_tpu.parallel import train_step as ts
from mvsformer_tpu.train.checkpoint import CheckpointManager
from mvsformer_tpu.train.meters import DictAverageMeter
from mvsformer_tpu.train.optim import make_optimizer
from mvsformer_tpu.utils import metrics as metric_lib


class Trainer:
    def __init__(self, cfg: Config, model, mesh, train_loader, val_loader=None,
                 writer=None, logger=None, is_blended=False, debug=False,
                 profile=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.writer = writer
        self.logger = logger or _PrintLogger()
        self.is_blended = is_blended
        self.debug = debug  # per-subtree grad inf/nan scan (train.py --debug)
        # (dir, start_step, n_steps): capture a jax.profiler trace over a
        # step window — the structured replacement for the reference's
        # wall-clock prints (SURVEY.md section 5.1).
        self.profile = profile
        self._profiling = False
        self._profiled = False
        self._profile_t0 = 0
        # >0: write a model_step checkpoint every N optimizer steps so a
        # preempted run resumes mid-epoch (beyond the reference's
        # epoch-granularity recovery, SURVEY.md section 5.3).
        self.save_every_steps = getattr(cfg.trainer, "save_every_steps", 0)
        self.scale_batch_map = {
            int(k): v for k, v in
            (cfg.data.multi_scale_args.scale_batch_map or {}).items()
        }

        self.total_steps = max(1, len(train_loader)) * cfg.trainer.epochs
        self.global_step = 0

        run_dir = os.path.join(cfg.trainer.save_dir, "models", cfg.name)
        self.ckpt = CheckpointManager(run_dir, cfg.trainer.monitor,
                                      cfg.trainer.save_period)

        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self._grad_step = None
        self._apply_step = None
        self._eval_step = None
        self._not_improved = 0

    # -- state ---------------------------------------------------------------

    def init_state(self, sample_batch):
        """Initialize params from one (small) batch; build optimizer."""
        split = ts.split_ref_src(sample_batch)
        imgs = jnp.asarray(sample_batch["imgs"][:1])
        projs = jax.tree.map(lambda x: jnp.asarray(x[:1]), sample_batch["proj_matrices"])
        dv = jnp.asarray(sample_batch["depth_values"][:1])
        from mvsformer_tpu.models.mvsformer import build_model

        serial = build_model(self.cfg.arch, dtype=self.model.dtype)
        variables = jax.jit(
            lambda k: serial.init(k, imgs, projs, dv, training=False)
        )(jax.random.PRNGKey(0))
        self.params = variables["params"]
        vit_path = self.cfg.arch.vit_args.vit_path
        if vit_path:
            # The reference loads pretrained Twins/DINO weights at model
            # construction (mvsformer_model.py:182-193,335-340); here they are
            # merged into the init pytree non-strictly with a key report.
            from mvsformer_tpu.utils.convert_weights import merge_pretrained_backbone

            self.params = merge_pretrained_backbone(
                self.params, vit_path, self.cfg.arch.vit_args.vit_arch,
                log=self.logger.info)
        self.batch_stats = variables.get("batch_stats", {})
        self.optimizer, self.schedule = make_optimizer(
            self.params, self.cfg.optimizer, self.cfg.arch.model_type,
            self.total_steps, fix_backbone=self.cfg.arch.fix)
        self.opt_state = self.optimizer.init(self.params)
        self._grad_step = ts.make_grad_step(self.model, self.cfg.arch, self.mesh)
        self._apply_step = ts.make_apply_step(self.optimizer)
        self._eval_step = ts.make_eval_step(self.model, self.cfg.arch, self.mesh)

    def state_dict(self):
        return {"params": self.params, "batch_stats": self.batch_stats,
                "opt_state": self.opt_state}

    def _replicate(self, tree):
        """Re-place a (checkpoint-restored, device-0-committed) pytree as
        replicated over the mesh — shard_map rejects single-device inputs."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(self.mesh, PartitionSpec())
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def restore(self, name="model_last"):
        state, meta = self.ckpt.restore(name, self.state_dict())
        state = self._replicate(state)
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        self.opt_state = state["opt_state"]
        # Resume the step counter so logged LR and the remaining schedule
        # continue where they left off (round-1 bug: LR display restarted at 0).
        self.global_step = int(meta.get("global_step", self.global_step))
        return meta

    def resume_auto(self):
        """Resume from the furthest checkpoint: the mid-epoch `model_step`
        (preemption recovery) when it is ahead of the last epoch-end
        `model_last`. Returns {"start_epoch", "skip_batches"} or None."""
        best_name, best_meta = None, {}
        for name in ("model_last", "model_step"):
            if self.ckpt.has(name):
                meta = self.ckpt.peek_meta(name)
                if (best_name is None
                        or meta.get("global_step", 0)
                        > best_meta.get("global_step", 0)):
                    best_name, best_meta = name, meta
        if best_name is None:
            return None
        meta = self.restore(best_name)
        if best_name == "model_step":
            out = {"start_epoch": int(meta.get("epoch", 1)),
                   "skip_batches": int(meta.get("batch_idx", -1)) + 1}
        else:
            out = {"start_epoch": int(meta.get("epoch", 0)) + 1,
                   "skip_batches": 0}
        self.logger.info(
            f"resumed {best_name} (epoch {meta.get('epoch')}, global_step "
            f"{self.global_step}) -> start_epoch {out['start_epoch']}, "
            f"skip {out['skip_batches']} batches")
        return out

    def finetune(self, ckpt_dir: str, name: str = "model_best",
                 restore_opt: bool = True, reset_schedule: bool = True):
        """Finetune restore (reference train.py:106-131): load a previous
        run's checkpoint (e.g. DTU-trained) into this run (e.g. BlendedMVS),
        optionally restoring optimizer moments, and either reset the LR
        schedule to step 0 (reference's new-scheduler branch) or fast-forward
        it to the checkpoint's step (reference's replay loop)."""
        from mvsformer_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, self.cfg.trainer.monitor)
        # Template only what will actually be used: with restore_opt=False a
        # params-only checkpoint (e.g. a converted/eval export with no
        # optimizer state) must restore cleanly.
        template = {"params": self.params, "batch_stats": self.batch_stats}
        if restore_opt:
            template["opt_state"] = self.opt_state
        state, meta = mgr.restore(name, template)
        state = self._replicate(state)
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        if restore_opt:
            self.opt_state = state["opt_state"]
            if reset_schedule:
                # Keep Adam moments, restart warmup-cosine: zero every step
                # counter in the optax state (schedule + bias correction).
                self.opt_state = _zero_counts(self.opt_state)
        else:
            self.opt_state = self.optimizer.init(self.params)
            if not reset_schedule:
                # Fresh moments but a fast-forwarded schedule: advance the
                # optax counts so the applied LR matches the logged
                # schedule(global_step) (reference's replay loop,
                # train.py:121-122).
                self.opt_state = _set_counts(
                    self.opt_state, int(meta.get("global_step", 0)))
        self.global_step = 0 if reset_schedule else int(meta.get("global_step", 0))
        self.logger.info(
            f"finetune: restored {name} from {ckpt_dir} "
            f"(epoch {meta.get('epoch')}, restore_opt={restore_opt}, "
            f"reset_schedule={reset_schedule}, global_step={self.global_step})")
        return meta

    # -- loops ---------------------------------------------------------------

    def micro_batches(self, batch):
        """Split a host batch into micro-batches sized by image height
        (mvsformer_trainer.py:87-102). scale_batch_map is PER-DEVICE (the
        reference's map is per-GPU micro-batch size), so the host micro-batch
        is map[h] * data-axis size."""
        B = batch["imgs"].shape[0]
        h = batch["imgs"].shape[2]
        n_data = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        if B % n_data != 0:
            raise ValueError(
                f"host batch {B} not divisible by data-parallel axis {n_data}")
        mb = self.scale_batch_map.get(h, B // n_data) * n_data
        mb = max(n_data, min(mb, B))
        while B % mb != 0:  # never silently drop trailing samples
            mb -= n_data
        n = B // mb
        for i in range(n):
            yield jax.tree.map(
                lambda x: x[i * mb:(i + 1) * mb] if isinstance(x, np.ndarray) else x,
                batch)

    def train_epoch(self, epoch: int, skip_batches: int = 0) -> dict:
        self.train_loader.set_epoch(epoch)
        meter = DictAverageMeter()
        t_epoch = time.time()
        for batch_idx, batch in enumerate(self.train_loader):
            if batch_idx < skip_batches:
                continue  # mid-epoch resume: deterministic loader order
                # (seeded per epoch) makes skipping exact
            t0 = time.time()
            if self.profile is not None:
                pdir, pstart, psteps = self.profile
                # >= (not ==): a resumed run whose restored global_step is
                # already past profile_start should still produce a trace
                # (one window only — _profiled latches after it closes).
                if (self.global_step >= pstart and not self._profiling
                        and not self._profiled):
                    jax.profiler.start_trace(pdir)
                    self._profiling = True
                    self._profile_t0 = self.global_step
                elif (self._profiling
                        and self.global_step >= self._profile_t0 + psteps):
                    jax.profiler.stop_trace()
                    self._profiling = False
                    self._profiled = True
                    self.logger.info(f"profiler trace written to {pdir}")
            grads = None
            n_micro = 0
            metrics = None
            for micro in self.micro_batches(batch):
                split = self._train_split(micro)
                # Per-micro-batch rng (fold_in) — round-1 bug reused one key
                # across accumulation slices, correlating droppath masks; and
                # batch_stats are chained micro->micro so every slice
                # contributes to the BN running stats (torch momentum-update-
                # per-forward semantics).
                g, self.batch_stats, metrics = self._grad_step(
                    self.params, self.batch_stats, split,
                    jax.random.fold_in(
                        jax.random.PRNGKey(self.global_step), n_micro))
                grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
                n_micro += 1
            if n_micro > 1:
                grads = jax.tree.map(lambda x: x / n_micro, grads)
            if self.debug:
                # The reference's fp16 overflow detector scans every layer's
                # scaled grad for inf/nan (mvsformer_trainer.py:139-155); in
                # bf16 there is no scaler, but the per-subtree scan remains a
                # numerical canary.
                for name, sub in self.params.items():
                    gmax = float(
                        jnp.max(jnp.asarray([
                            jnp.abs(g).max() for g in jax.tree.leaves(grads[name])
                        ])))
                    if not np.isfinite(gmax):
                        self.logger.info(
                            f"NONFINITE grad in '{name}' at step {self.global_step}")
                    if self.writer is not None:
                        self.writer.add_scalar(f"grads/{name}_max", gmax,
                                               self.global_step)
            self.params, self.opt_state, gnorm = self._apply_step(
                self.params, self.opt_state, grads)
            self.global_step += 1

            if (self.save_every_steps
                    and self.global_step % self.save_every_steps == 0):
                # Every process calls the save: orbax's save of mesh-sharded/
                # replicated global arrays is a cross-process collective
                # (process 0 alone would deadlock on the barrier). The manager
                # itself gates metadata writes on process_index()==0.
                self.ckpt._save("model_step", self.state_dict(), {
                    "epoch": epoch, "batch_idx": batch_idx,
                    "global_step": self.global_step,
                    "monitor_best": float(self.ckpt.best),
                })

            logs = {k: float(v) for k, v in metrics.items()}
            logs["grad_norm"] = float(gnorm)
            meter.update(logs)
            if batch_idx % self.cfg.trainer.logging_every == 0:
                lr = float(self.schedule(self.global_step))
                self.logger.info(
                    f"epoch {epoch} [{batch_idx}/{len(self.train_loader)}] "
                    f"loss={logs['loss']:.4f} lr={lr:.2e} "
                    f"time={time.time() - t0:.2f}s")
                # Train-time pred/gt image grids (the reference's save_images
                # at logging_every, mvsformer_trainer.py:186-190): one extra
                # eval forward on the last micro-batch, amortized over
                # logging_every steps. The jitted eval step runs on EVERY
                # process (it is a collective program over the multi-host
                # mesh; host-0-only entry would hang the others) — only the
                # image writes are host-0 gated via `writer`.
                log_images = (self.writer is not None
                              or jax.process_count() > 1)
                depth_est = conf = None
                if log_images:
                    try:
                        esplit = {k: split[k] for k in (
                            "imgs_ref", "imgs_src", "proj_ref", "proj_src",
                            "depth_values")}
                        depth_est, conf = self._eval_step(
                            self.params, self.batch_stats, esplit)
                    except Exception:
                        depth_est = None
                if self.writer is not None:
                    for k, v in logs.items():
                        self.writer.add_scalar(f"train/{k}", v, self.global_step)
                    self.writer.add_scalar("train/lr", lr, self.global_step)
                    if depth_est is not None:
                        try:
                            gt = np.asarray(micro["depth"]["stage4"][:1])
                            self.writer.add_image(
                                "train/pred_depth", _norm_img(depth_est),
                                self.global_step)
                            self.writer.add_image(
                                "train/gt_depth", _norm_img(gt), self.global_step)
                            self.writer.add_image(
                                "train/confidence", _norm_img(conf),
                                self.global_step)
                        except Exception:
                            pass
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            self._profiled = True
            self.logger.info(f"profiler trace written to {self.profile[0]}")
        out = meter.mean()
        out["epoch_time"] = time.time() - t_epoch
        return out

    def _stages(self):
        return [f"stage{i+1}" for i in range(len(self.cfg.arch.ndepths))]

    def _train_split(self, micro):
        b = {
            "imgs": micro["imgs"],
            "proj_matrices": {k: micro["proj_matrices"][k] for k in self._stages()},
            "depth_values": micro["depth_values"],
        }
        split = ts.split_ref_src(_to_jax(b))
        split["depth_gt"] = _to_jax({k: micro["depth"][k] for k in self._stages()})
        split["mask"] = _to_jax({k: micro["mask"][k] for k in self._stages()})
        return split

    def _eval_split(self, batch):
        b = {
            "imgs": batch["imgs"],
            "proj_matrices": {k: batch["proj_matrices"][k] for k in self._stages()},
            "depth_values": batch["depth_values"],
        }
        return ts.split_ref_src(_to_jax(b))

    def valid_epoch(self, epoch: int) -> dict:
        meter = DictAverageMeter()
        n_data = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        for batch in self.val_loader:
            # Pad a trailing partial batch (val loader keeps remainders,
            # drop_last=False) up to the data-axis multiple by repeating the
            # last sample; metrics below only read the true B outputs.
            B = batch["imgs"].shape[0]
            if B % n_data != 0:
                pad = n_data - B % n_data

                def _pad(x):
                    if isinstance(x, np.ndarray) and x.ndim >= 1 and x.shape[0] == B:
                        return np.concatenate([x, np.repeat(x[-1:], pad, 0)], 0)
                    return x

                batch = jax.tree.map(_pad, batch)
            split = self._eval_split(batch)
            depth_est, conf = self._eval_step(self.params, self.batch_stats, split)
            depth_est, conf = depth_est[:B], conf[:B]
            batch = jax.tree.map(
                lambda x: x[:B] if isinstance(x, np.ndarray) and x.ndim >= 1
                and x.shape[0] > B else x, batch)
            depth_gt = jnp.asarray(batch["depth"]["stage4"])
            mask = jnp.asarray(batch["mask"]["stage4"]) > 0.5
            dv = jnp.asarray(batch["depth_values"])
            itv = dv[:, 1] - dv[:, 0]
            if self.is_blended:
                # per-sample interval scaling (mvsformer_trainer.py:246-256)
                scalars = {}
                B = depth_est.shape[0]
                for j in range(B):
                    di = float(itv[j])
                    m = metric_lib.validation_metrics(
                        depth_est[j:j + 1], depth_gt[j:j + 1], mask[j:j + 1], di)
                    for k, v in m.items():
                        scalars[k] = scalars.get(k, 0.0) + float(v) / B
            else:
                di = float(itv[0]) / 2.65
                scalars = {k: float(v) for k, v in metric_lib.validation_metrics(
                    depth_est, depth_gt, mask, di).items()}
            meter.update(scalars)
        out = meter.mean()
        # Cross-host metric reduction (the reference's dist.all_reduce /
        # world_size at mvsformer_trainer.py:202-212).
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            keys = sorted(out)
            stacked = multihost_utils.process_allgather(
                jnp.asarray([out[k] for k in keys]))
            mean = np.asarray(stacked).mean(axis=0)
            out = {k: float(v) for k, v in zip(keys, mean)}
        out["mean_error"] = (out["thres2mm_error"] + out["thres4mm_error"]
                             + out["thres8mm_error"] + out["thres14mm_error"]) / 4.0
        if self.writer is not None:
            for k, v in out.items():
                self.writer.add_scalar(f"val/{k}", v, epoch)
            # Normalized pred/gt/conf image grid (utils.py:92-116 save_images).
            try:
                self.writer.add_image("val/pred_depth",
                                      _norm_img(depth_est * mask), epoch)
                self.writer.add_image("val/gt_depth", _norm_img(depth_gt), epoch)
                self.writer.add_image("val/confidence", _norm_img(conf), epoch)
            except Exception:
                pass
        return out

    def train(self, start_epoch: int = 1, skip_batches: int = 0):
        history = []
        for epoch in range(start_epoch, self.cfg.trainer.epochs + 1):
            train_log = self.train_epoch(
                epoch, skip_batches if epoch == start_epoch else 0)
            self.logger.info(f"epoch {epoch} train: {train_log}")
            log = dict(train_log)
            if self.val_loader is not None and epoch % self.cfg.trainer.eval_freq == 0:
                val_log = self.valid_epoch(epoch)
                self.logger.info(f"epoch {epoch} val: {val_log}")
                log.update({f"val_{k}": v for k, v in val_log.items()})
                improved = self.ckpt.step(epoch, val_log["mean_error"],
                                          self.state_dict(),
                                          extra_meta={"global_step": self.global_step})
                self._not_improved = 0 if improved else self._not_improved + 1
                if self._not_improved >= self.cfg.trainer.early_stop:
                    self.logger.info(
                        f"early stop after {self._not_improved} stale epochs")
                    history.append(log)
                    break
            else:
                self.ckpt.step(epoch, self.ckpt.best, self.state_dict(),
                               extra_meta={"global_step": self.global_step})
            history.append(log)
        return history


def _norm_img(x):
    """First sample, percentile-normalized, as a [1, H, W] TB image."""
    x = np.asarray(x[0], np.float32)
    lo, hi = np.percentile(x, 2), np.percentile(x, 98)
    return np.clip((x - lo) / max(hi - lo, 1e-6), 0, 1)[None]


def _set_counts(state, step: int):
    """Set every `count` field in an optax state tree (schedule position +
    Adam bias-correction step) to `step`, keeping the moment estimates."""
    if hasattr(state, "_fields"):
        vals = {f: _set_counts(getattr(state, f), step) for f in state._fields}
        if "count" in state._fields:
            vals["count"] = jnp.full_like(state.count, step)
        return type(state)(**vals)
    if isinstance(state, tuple):
        return tuple(_set_counts(s, step) for s in state)
    if isinstance(state, list):
        return [_set_counts(s, step) for s in state]
    if isinstance(state, dict):
        return {k: _set_counts(v, step) for k, v in state.items()}
    return state


def _zero_counts(state):
    """Zero the optax counts — the finetune reset-scheduler branch
    (reference train.py:113-118)."""
    return _set_counts(state, 0)


def _to_jax(tree):
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


class _PrintLogger:
    def info(self, msg):
        print(msg, flush=True)
