"""Training manager: scan-compiled epochs, optax AdamW + warm restarts.

Parity target: ``Trainer`` (``src/ai/train.py:282-567``) — same hyper-
parameters, loss, LR schedule (epoch-stepped cosine warm restarts), gradient
clipping (global norm 1.0), input-noise injection with pos resync
(``train.py:409-415``), early stopping, checkpoint cadence
(best-on-improvement / every ``save_every`` epochs / final —
``train.py:519-533``), history JSON with the same keys.

TPU-first deviations:
- the epoch is ONE jitted device program (``lax.scan`` over batches) over
  HBM-resident data — no DataLoader workers, no per-batch host->device copy
  (the reference crosses that boundary 3,910 times per epoch, SURVEY §3.3);
- batches are ``batch_size``-sized with the remainder dropped (static shapes;
  at the production scale that discards <0.03% of samples per epoch — the
  permutation reshuffles every epoch so all samples are seen over time);
- train/val loss semantics preserved: train loss is dropout-ON (reference
  documents train >> val for this loss — METHODOLOGY.md:381-390).
"""

import json
import os
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nbody_gnn_hpc_tpu.io.model_io import load_checkpoint, save_checkpoint
from nbody_gnn_hpc_tpu.models.gnn import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss
from nbody_gnn_hpc_tpu.train.schedule import (cosine_warm_restarts,
                                              make_step_schedule)


class Trainer:
    """Training manager for the N-body GNN (reference surface:
    ``train.py:282``)."""

    def __init__(self,
                 model: NBodyGNN,
                 train_dataset,
                 val_dataset=None,
                 model_dir: str = "./models",
                 device: Optional[str] = None,   # parity arg; backend is JAX's
                 learning_rate: float = 5e-4,
                 batch_size: int = 24,
                 use_physics_loss: bool = True,
                 num_workers: int = 2,           # parity arg; no host workers
                 weight_decay: float = 1e-4,
                 noise_std: float = 0.003,
                 n_epochs: int = 200,
                 seed: int = 0,
                 fast_prng: bool = True,
                 epoch_chunk: int = 1000,
                 mesh=None,
                 ckpt_backend: str = "pickle"):
        """``mesh``: optional 1-D ``jax.sharding.Mesh`` (axis 'data') — the
        per-batch compute is sharded over it (params replicated, gradient
        psum placed by XLA).  The reference has no training parallelism
        (SURVEY §2.3); this is the TPU-native extension.

        ``ckpt_backend``: 'pickle' (default — reference-parity ``.pt`` files,
        synchronous) or 'orbax' — async writes via
        :class:`~nbody_gnn_hpc_tpu.io.orbax_io.OrbaxCheckpointer`: the big
        tensors (params + optimizer state) stream in the background while
        training continues; small metadata goes in a synchronous sidecar
        index. ``save_model``/``load_model`` keep the same filename surface
        either way.
        """
        del device, num_workers
        self.mesh = mesh
        if ckpt_backend not in ("pickle", "orbax"):
            raise ValueError(f"unknown ckpt_backend {ckpt_backend!r}")
        self.ckpt_backend = ckpt_backend
        self._orbax = None
        self._orbax_step = 0
        if fast_prng:
            # Threefry dropout-mask generation is a measurable share of the
            # train step on TPU (~15 ms/step at production scale); the
            # hardware-backed rbg implementation removes it.
            jax.config.update("jax_default_prng_impl", "rbg")
        self.model = model
        self.model_dir = Path(model_dir)
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.noise_std = noise_std
        self.use_physics_loss = use_physics_loss
        self.n_epochs = n_epochs

        # -- data to device --------------------------------------------------
        self.train_states, self.train_targets = train_dataset.device_arrays()
        self.n_train = int(self.train_states.shape[0])
        self.n_particles = int(self.train_states.shape[1])
        if val_dataset is not None:
            self.val_states, self.val_targets = val_dataset.device_arrays()
            self.n_val = int(self.val_states.shape[0])
        else:
            self.val_states = self.val_targets = None
            self.n_val = 0

        self.edge_index = jnp.asarray(train_dataset.edge_index)

        if hasattr(train_dataset, "get_masses_tensor"):
            self.masses = jnp.asarray(train_dataset.get_masses_tensor())
        else:
            self.masses = None
        if hasattr(train_dataset, "get_normalization_stats"):
            self.norm_stats = train_dataset.get_normalization_stats()
        else:
            self.norm_stats = None

        mean = jnp.asarray(self.norm_stats["state_mean"]) if self.norm_stats \
            else jnp.zeros(6, jnp.float32)
        std = jnp.asarray(self.norm_stats["state_std"]) if self.norm_stats \
            else jnp.ones(6, jnp.float32)
        self._mean, self._std = mean, std
        if self.masses is not None:
            self._mass_feat = (self.masses / self.masses.mean())[:, None]
        else:
            self._mass_feat = jnp.ones((self.n_particles, 1), jnp.float32)

        # -- loss / optimizer -------------------------------------------------
        self.criterion = PhysicsInformedLoss() if use_physics_loss else None

        self._batch = min(batch_size, self.n_train)
        self.steps_per_epoch = max(1, self.n_train // self._batch)
        # Epochs run as scan-compiled chunks of at most this many batches:
        # one multi-minute device program can exceed backend execution
        # limits, and chunking costs only a handful of dispatches.
        self._chunk = max(1, min(epoch_chunk, self.steps_per_epoch))
        schedule = make_step_schedule(learning_rate, self.steps_per_epoch)
        self._schedule = schedule
        self.tx = optax.chain(
            optax.clip_by_global_norm(1.0),  # train.py:429
            optax.adamw(schedule, weight_decay=weight_decay),
        )

        self._rng = jax.random.PRNGKey(seed)
        self._rng, init_key = jax.random.split(self._rng)
        self.params = init_model(model, init_key, self.n_particles,
                                 int(self.edge_index.shape[1]))
        self.opt_state = self.tx.init(self.params)

        # epoch_time_s is additive beyond the reference's history keys
        # (train.py:563-567) — readers that expect the reference schema
        # ignore it; the printed per-epoch line format stays parity-exact.
        self.history = {"train_loss": [], "val_loss": [], "learning_rate": [],
                        "energy_loss": [], "momentum_loss": [],
                        "epoch_time_s": []}
        self.best_val_loss = float("inf")
        self.current_epoch = 0
        self._watchdog = None  # armed by train(watchdog_s=...)

        from nbody_gnn_hpc_tpu.train.steps import make_train_step

        self._step = make_train_step(
            self.model, self.tx, self.edge_index, self._mean, self._std,
            self._mass_feat, noise_std=self.noise_std, masses=self.masses,
            criterion=self.criterion, use_physics_loss=use_physics_loss)
        self._epoch_fn = self._build_epoch_fn()
        self._val_fn = self._build_val_fn()

    # -- jitted programs ------------------------------------------------------

    def _build_epoch_fn(self):
        # NOTE: the dataset arrays are jit ARGUMENTS, not closure captures —
        # closed-over device arrays get embedded into the lowered program as
        # constants (hundreds of MB of HLO at production scale, which big
        # compile services reject outright).
        step = self._step

        if self.mesh is not None:
            from nbody_gnn_hpc_tpu.parallel.mesh import batch_sharding

            data_sharding = batch_sharding(self.mesh)
        else:
            data_sharding = None

        def train_step(states, targets, carry, batch_idx):
            params, opt_state, key = carry
            key, k_step = jax.random.split(key)
            s = jnp.take(states, batch_idx, axis=0)      # (B, N, 6) raw
            t = jnp.take(targets, batch_idx, axis=0)
            if data_sharding is not None:
                # Split the batch over the mesh; params stay replicated and
                # XLA inserts the gradient psum over ICI.
                s = jax.lax.with_sharding_constraint(s, data_sharding)
                t = jax.lax.with_sharding_constraint(t, data_sharding)
            params, opt_state, loss = step(params, opt_state, s, t, k_step)
            return (params, opt_state, key), loss

        @jax.jit
        def chunk_fn(params, opt_state, key, states, targets, batch_ids):
            (params, opt_state, key), losses = jax.lax.scan(
                lambda c, b: train_step(states, targets, c, b),
                (params, opt_state, key), batch_ids)
            return params, opt_state, key, jnp.sum(losses)

        return chunk_fn

    def _build_val_fn(self):
        if self.val_states is None:
            return None
        batch = min(self._batch, self.n_val)
        n_batches = max(1, self.n_val // batch)
        remainder = self.n_val - n_batches * batch
        compute_loss = self._step.compute_loss

        def val_step_p(params, states, targets, batch_idx):
            s = jnp.take(states, batch_idx, axis=0)
            t = jnp.take(targets, batch_idx, axis=0)
            _, details = compute_loss(params, s, t, None, deterministic=True)
            return details

        @jax.jit
        def main_fn(params, states, targets):
            ids = jnp.arange(n_batches * batch).reshape(n_batches, batch)
            _, details = jax.lax.scan(
                lambda c, b: (c, val_step_p(params, states, targets, b)),
                None, ids)
            return jax.tree_util.tree_map(jnp.sum, details)

        @jax.jit
        def tail_fn(params, states, targets):
            ids = jnp.arange(n_batches * batch, self.n_val)
            return val_step_p(params, states, targets, ids)

        def val_fn(params, states, targets):
            # Every sample participates; per-batch losses are equally
            # weighted including the smaller final batch, matching the
            # reference's sum/n_batches over a non-drop_last loader
            # (train.py:448-467).
            sums = main_fn(params, states, targets)
            count = n_batches
            if remainder:
                tail = tail_fn(params, states, targets)
                sums = jax.tree_util.tree_map(jnp.add, sums, tail)
                count += 1
            return jax.tree_util.tree_map(lambda s: s / count, sums)

        return val_fn

    # -- reference surface -----------------------------------------------------

    def train_epoch(self) -> float:
        """One epoch (parity: ``train.py:396-435``); returns mean train loss.

        The epoch executes as ceil(n_batches / chunk) scan-compiled device
        programs over a fresh device-side permutation (at most two distinct
        chunk shapes -> at most two compiles, cached)."""
        nb, batch = self.steps_per_epoch, self._batch
        self._rng, k_perm = jax.random.split(self._rng)
        perm = jax.random.permutation(k_perm, self.n_train)
        batch_ids = perm[:nb * batch].reshape(nb, batch)

        total = 0.0
        start = 0
        while start < nb:
            size = min(self._chunk, nb - start)
            self.params, self.opt_state, self._rng, s = self._epoch_fn(
                self.params, self.opt_state, self._rng,
                self.train_states, self.train_targets,
                jax.lax.dynamic_slice_in_dim(batch_ids, start, size, 0))
            total += float(s)
            start += size
            if self._watchdog is not None:
                # float(s) above is a host readback, so the chunk's device
                # work provably completed — an honest progress beat.
                self._watchdog.beat()
        return total / nb

    def validate(self):
        """(val_loss, details) with dropout off (parity: ``train.py:437-467``)."""
        if self._val_fn is None:
            return float("nan"), {}
        details = self._val_fn(self.params, self.val_states,
                               self.val_targets)
        details = {k: float(v) for k, v in details.items()}
        return details.get("total", float("nan")), details

    def _align_history(self) -> None:
        """Keep the additive epoch_time_s list index-aligned with the
        reference keys when resuming from a checkpoint that predates it
        (pad missing entries with None so epoch j's time stays at index j)."""
        n = len(self.history.get("train_loss", []))
        times = self.history.setdefault("epoch_time_s", [])
        if len(times) < n:
            self.history["epoch_time_s"] = [None] * (n - len(times)) + times

    def current_lr(self) -> float:
        return float(cosine_warm_restarts(self.current_epoch - 1
                                          if self.current_epoch > 0 else 0,
                                          self.learning_rate))

    def train(self, n_epochs: int = 50, early_stopping_patience: int = 30,
              save_every: int = 10, verbose: bool = True,
              watchdog_s: Optional[float] = None) -> Dict:
        """Full training loop with early stopping (parity: ``train.py:469-535``).

        ``watchdog_s``: if set, arm a stall watchdog (see
        :mod:`nbody_gnn_hpc_tpu.utils.watchdog`) that exits the process with
        ``STALL_EXIT_CODE`` when no epoch chunk completes for that many
        seconds — a backend outage mid-run then becomes a clean, resumable
        failure (``train_model.py --resume auto``) instead of an indefinite
        hang. Must be generous enough to cover the first chunk's compile.
        """
        from nbody_gnn_hpc_tpu.models.gnn import count_parameters

        print(f"Training on {jax.default_backend()}")
        print(f"Model parameters: {count_parameters(self.params):,}")
        if self.masses is not None and self.use_physics_loss:
            print(f"Physics loss: ENABLED (masses loaded for "
                  f"{self.masses.shape[0]} particles)")
        else:
            print("Physics loss: DISABLED (no masses)")
        print(f"Input noise std: {self.noise_std}")

        from nbody_gnn_hpc_tpu.utils.watchdog import maybe_watchdog

        # None/0 -> disabled; negative -> ValueError (uniform CLI semantics).
        self._watchdog = maybe_watchdog(watchdog_s,
                                        what="training-epoch progress")
        patience_counter = 0
        stopped_early = False
        # Resumed runs continue the global epoch numbering (load_model
        # restores current_epoch; the optimizer's step-count schedule already
        # continues correctly — this keeps the displayed/recorded LR in sync).
        start_epoch = self.current_epoch
        try:
            for epoch in range(n_epochs):
                self.current_epoch = start_epoch + epoch + 1
                # LR in effect this epoch (scheduler stepped at epoch end in
                # the reference, so epoch e runs at lr(e), 0-indexed).
                current_lr = float(cosine_warm_restarts(start_epoch + epoch,
                                                        self.learning_rate))

                epoch_t0 = time.time()
                train_loss = self.train_epoch()
                self.history["train_loss"].append(train_loss)

                val_loss, val_details = self.validate()
                self.history["val_loss"].append(val_loss)
                self.history["learning_rate"].append(current_lr)
                self.history["energy_loss"].append(
                    val_details.get("energy", 0))
                self.history["momentum_loss"].append(
                    val_details.get("momentum", 0))
                # train_loss/val_loss above are host floats, so the device
                # work has completed by here (the axon backend needs a
                # readback to sync — block_until_ready is a no-op there).
                self.history.setdefault("epoch_time_s", []).append(
                    round(time.time() - epoch_t0, 3))

                if verbose:
                    best_marker = (" ★ BEST"
                                   if val_loss < self.best_val_loss else "")
                    print(f"  Epoch {self.current_epoch:3d} | "
                          f"train: {train_loss:.4f} | val: {val_loss:.4f} | "
                          f"E: {val_details.get('energy', 0):.4f} | "
                          f"M: {val_details.get('momentum', 0):.4f} | "
                          f"lr: {current_lr:.2e}{best_marker}")

                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    self.save_model("best_model.pt")
                    patience_counter = 0
                else:
                    patience_counter += 1

                if patience_counter >= early_stopping_patience:
                    print(f"\nEarly stopping at epoch {self.current_epoch}")
                    stopped_early = True
                    break

                if (epoch + 1) % save_every == 0:
                    self.save_model(
                        f"checkpoint_epoch_{self.current_epoch}.pt")
            # The end-of-training artifacts do device readbacks too
            # (save_model numpy-ifies the params; the orbax wait blocks on
            # async tensor writes) — an outage here would hang exactly like
            # a mid-epoch one, so the watchdog stays armed until they are
            # durable.
            self.save_model("final_model.pt")
            self._save_history(completed=True, early_stopped=stopped_early)
            if self._orbax is not None:
                self._orbax.wait()  # async writes must be durable at exit
        finally:
            # Disarm even on exceptions: a leaked armed watchdog would
            # os._exit an otherwise-healthy process later.
            if self._watchdog is not None:
                self._watchdog.stop()
                self._watchdog = None
        return self.history

    # -- checkpoints (parity: train.py:537-567) --------------------------------

    @property
    def _model_config(self) -> Dict:
        return {
            "node_input_dim": self.model.node_input_dim,
            "hidden_dim": self.model.hidden_dim,
            "n_layers": self.model.n_layers,
            "output_dim": self.model.output_dim,
            "dropout": self.model.dropout,
        }

    def _orbax_mgr(self):
        if self._orbax is None:
            from nbody_gnn_hpc_tpu.io.orbax_io import OrbaxCheckpointer

            self._orbax = OrbaxCheckpointer(str(self.model_dir / "orbax"))
            self._orbax_step = self._orbax.latest_step() or 0
        return self._orbax

    def _orbax_index_path(self) -> Path:
        return self.model_dir / "orbax_index.json"

    def _save_orbax(self, filename: str) -> str:
        """Async-checkpoint the big tensors via Orbax; small metadata goes in
        a synchronous sidecar index keyed by the same filenames the pickle
        backend uses, so ``load_model('best_model.pt')`` works unchanged."""
        mgr = self._orbax_mgr()
        self._orbax_step += 1
        mgr.save(self._orbax_step,
                 {"params": self.params, "opt_state": self.opt_state},
                 force=True)  # returns immediately; write is async
        index = {}
        if self._orbax_index_path().exists():
            index = json.loads(self._orbax_index_path().read_text())
        index[filename] = {
            "step": self._orbax_step,
            "scheduler_state_dict": {"epoch": self.current_epoch},
            "best_val_loss": self.best_val_loss,
            "history": self.history,
            "norm_stats": jax.tree_util.tree_map(
                lambda a: np.asarray(a).tolist(), self.norm_stats)
            if self.norm_stats else None,
            "model_config": self._model_config,
        }
        # Atomic sidecar write: the index gates resume (latest_checkpoint),
        # so a crash mid-write must not tear it.
        tmp = self._orbax_index_path().with_suffix(".json.tmp")
        tmp.write_text(json.dumps(index, indent=2))
        os.replace(tmp, self._orbax_index_path())
        return str(self.model_dir / "orbax" / str(self._orbax_step))

    def _load_orbax(self, filename: str) -> None:
        index = json.loads(self._orbax_index_path().read_text())
        if filename not in index:
            raise FileNotFoundError(
                f"{filename} not in {self._orbax_index_path()}")
        entry = index[filename]
        mgr = self._orbax_mgr()
        mgr.wait()  # the target step must be durable before restore
        restored = mgr.restore(
            entry["step"],
            like={"params": self.params, "opt_state": self.opt_state})
        self.params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
        self.opt_state = jax.tree_util.tree_map(jnp.asarray,
                                                restored["opt_state"])
        self.best_val_loss = entry.get("best_val_loss", float("inf"))
        if entry.get("history"):
            self.history = entry["history"]
            self._align_history()
        if entry.get("norm_stats") is not None:
            self.norm_stats = {k: np.asarray(v, np.float32)
                               for k, v in entry["norm_stats"].items()}
        self.current_epoch = int(
            (entry.get("scheduler_state_dict") or {}).get("epoch", 0))

    def save_model(self, filename: str) -> str:
        if self.ckpt_backend == "orbax":
            return self._save_orbax(filename)
        return save_checkpoint(
            self.model_dir / filename,
            params=self.params,
            opt_state=self.opt_state,
            scheduler_state=dict(epoch=self.current_epoch),
            best_val_loss=self.best_val_loss,
            history=self.history,
            norm_stats=self.norm_stats,
            model_config=self._model_config,
        )

    def load_model(self, filename: str) -> None:
        if self.ckpt_backend == "orbax":
            self._load_orbax(filename)
            return
        ckpt = load_checkpoint(self.model_dir / filename)
        self.params = jax.tree_util.tree_map(jnp.asarray,
                                             ckpt["model_state_dict"])
        if ckpt.get("optimizer_state_dict") is not None:
            # Restore leaf values into the freshly-initialized optax state
            # structure (pickle stores numpy leaves of the same pytree).
            flat_saved = jax.tree_util.tree_leaves(ckpt["optimizer_state_dict"])
            treedef = jax.tree_util.tree_structure(self.opt_state)
            self.opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(x) for x in flat_saved])
        self.best_val_loss = ckpt.get("best_val_loss", float("inf"))
        if ckpt.get("history"):
            self.history = ckpt["history"]
            self._align_history()
        if ckpt.get("norm_stats") is not None:
            self.norm_stats = ckpt["norm_stats"]
        sched = ckpt.get("scheduler_state_dict") or {}
        self.current_epoch = int(sched.get("epoch", 0))

    def _save_history(self, completed: bool = False,
                      early_stopped: bool = False) -> None:
        """Persist the history; ``completed=True`` additionally stamps
        markers so ``train_model.py --resume auto`` can tell an
        EARLY-STOPPED run (patience fired before the budget — 0 remaining
        epochs; retraining past patience is pure waste) from a crashed one
        (no marker) and from a budget-completed one (``completed`` without
        ``early_stopped`` — extendable to a larger ``--epochs``). Markers
        live ONLY in the JSON file — never in ``self.history`` — so
        checkpoints saved mid-run (which embed the history) can never carry
        a stale one."""
        payload = dict(self.history)
        if completed:
            payload["completed"] = True
            payload["early_stopped"] = bool(early_stopped)
        with open(self.model_dir / "training_history.json", "w") as f:
            json.dump(payload, f, indent=2)
