"""Checkpoint save/restore (orbax): best/last policy with monitored metric.

Functional spec: /root/reference/base/base_trainer.py:140-198 — single-file
torch.save dict {arch, epoch, state_dict, optimizer, monitor_best, config};
`model_best` when the monitored metric improves, `model_last` every
save_period epochs; resume restores epoch/monitor/model/optimizer.

TPU build: orbax sharded checkpoints of the param/opt-state pytrees; works
unchanged for multi-host sharded state.
"""

from __future__ import annotations

import json
import os

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, monitor: str = "min mean_error",
                 save_period: int = 1):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        mode, metric = monitor.split()
        assert mode in ("min", "max")
        self.mode = mode
        self.metric = metric
        self.save_period = save_period
        self.best = np.inf if mode == "min" else -np.inf
        self._ckptr = ocp.StandardCheckpointer()

    def improved(self, value: float) -> bool:
        return value < self.best if self.mode == "min" else value > self.best

    def _save(self, name: str, state: dict, meta: dict):
        """All processes must call this (orbax's save of mesh-sharded global
        arrays is a cross-process collective); the json sidecar is written by
        process 0 only, atomically (tmp + os.replace) so a preemption mid-write
        can never leave a truncated meta that would break the next resume —
        worst case the sidecar is one save behind, which only re-trains a few
        batches (deterministic loader order makes that exact, never skips)."""
        import jax

        path = os.path.join(self.ckpt_dir, name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            tmp = path + ".meta.json.tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, path + ".meta.json")

    def step(self, epoch: int, value: float, state: dict, extra_meta=None) -> bool:
        """Apply the best/last policy after a validation epoch. Returns True
        if `value` was an improvement."""
        meta = {"epoch": epoch, "monitor_metric": self.metric,
                "monitor_value": float(value), "monitor_best": float(self.best)}
        if extra_meta:
            meta.update(extra_meta)
        is_best = self.improved(value)
        if is_best:
            self.best = value
            meta["monitor_best"] = float(self.best)
            self._save("model_best", state, meta)
        if epoch % self.save_period == 0:
            self._save("model_last", state, meta)
        return is_best

    def restore(self, name: str, template: dict | None = None):
        """Restore `name` ('model_best' | 'model_last') into the shape/dtype
        template pytree. Returns (state, meta).

        A template holding only a SUBSET of the saved top-level keys (e.g.
        eval-time {params, batch_stats} without opt_state, the reference's
        model-only test load, test.py:203-209) restores just those subtrees."""
        path = os.path.join(self.ckpt_dir, name)
        if template is None:
            state = self._restore_via_metadata(path)
        else:
            try:
                state = self._ckptr.restore(path, template)
            except ValueError:
                full = self._restore_via_metadata(path)
                missing = sorted(set(template) - set(full))
                if missing:
                    raise KeyError(
                        f"checkpoint {path} lacks requested keys {missing}")
                state = {k: full[k] for k in template}
        meta = {}
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        self.best = meta.get("monitor_best", self.best)
        return state, meta

    def _restore_via_metadata(self, path: str):
        """Template-free restore: build the abstract tree from the checkpoint's
        own metadata with local single-device sharding, so a checkpoint saved
        on an N-device mesh restores on any topology (eval-time load)."""
        import jax

        tree = self._ckptr.metadata(path).item_metadata
        sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sds), tree)
        return self._ckptr.restore(path, template)

    def has(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.ckpt_dir, name))

    def peek_meta(self, name: str) -> dict:
        """Read a checkpoint's sidecar meta without restoring tensors."""
        path = os.path.join(self.ckpt_dir, name) + ".meta.json"
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)
