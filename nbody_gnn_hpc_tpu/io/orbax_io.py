"""Optional Orbax checkpoint backend (async-capable).

SURVEY §2.3 (elasticity row) calls for "Orbax-style async checkpointing for
training" as the TPU-native upgrade over the reference's synchronous torch
saves.  The default Trainer backend remains the pickle ``.pt`` format (file
name parity with the reference); this module offers an Orbax alternative
whose save returns immediately while the write happens in the background.

Usage:
    mgr = OrbaxCheckpointer("./models/orbax")
    mgr.save(step, {"params": params, "opt_state": opt_state}, force=True)
    restored = mgr.restore(step, like={"params": params_like, ...})
    mgr.wait()   # block until async writes are durable
"""

from pathlib import Path
from typing import Any, Optional


class OrbaxCheckpointer:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager`` with async
    writes enabled; lazily imports orbax so the default path never pays for
    it."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True),
        )

    def save(self, step: int, tree: Any, force: bool = False) -> bool:
        """Queue an async save of ``tree`` (any pytree) at ``step``."""
        return self._manager.save(
            step, args=self._ocp.args.StandardSave(tree), force=force)

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        """Restore ``step`` (default: latest).  ``like`` is a pytree of the
        target structure (arrays restored with matching sharding/dtype)."""
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints in {self.directory}")
        if like is not None:
            return self._manager.restore(
                step, args=self._ocp.args.StandardRestore(like))
        return self._manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def all_steps(self):
        return self._manager.all_steps()

    def wait(self) -> None:
        """Block until queued async saves are durable on disk."""
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.close()
