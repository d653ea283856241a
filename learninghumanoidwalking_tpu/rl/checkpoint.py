"""Orbax-based checkpointing.

Replaces /root/reference/rl/utils/checkpointer.py (whole-module pickles) with
Orbax checkpoints of a self-contained pytree: actor/critic params, optimizer
states, observation-normalization stats, env RNG key, and iteration count —
i.e. strictly more resumable than the reference (which does not persist
optimizer state or iteration, ppo.py:69-82).

Layout under logdir/:
  checkpoints/<itr>/   periodic saves at every eval (actor_<itr>.pt analog)
  best/                best-so-far by eval reward (actor.pt analog)
  experiment.json      config + env name (experiment.pkl analog)
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, logdir: str | Path):
        self.logdir = Path(logdir)
        self.ckpt_dir = self.logdir / "checkpoints"
        self.best_dir = self.logdir / "best"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._saver = ocp.StandardCheckpointer()

    def save_experiment(self, config: dict) -> None:
        with open(self.logdir / "experiment.json", "w") as f:
            json.dump(config, f, indent=2, default=str)

    @staticmethod
    def load_experiment(logdir: str | Path) -> dict:
        with open(Path(logdir) / "experiment.json") as f:
            return json.load(f)

    @staticmethod
    def _persistable(train_state: Any) -> dict:
        """Strip the transient env batch (fresh envs are created on resume,
        like the reference's --continued path, ppo.py:69-82) and zero-size
        leaves that Orbax cannot serialize.

        Recurrent hidden states (actor_carry/critic_carry) are intentionally
        NOT persisted: they are per-env-batch state, and the env batch itself
        is recreated fresh on resume — a restored run re-inits carries to
        zero via init_state, matching episode-boundary semantics (the hidden
        state is zeroed at every reset anyway, ppo._mask_carry)."""
        return {
            "actor_params": train_state.actor_params,
            "critic_params": train_state.critic_params,
            "actor_opt": train_state.actor_opt,
            "critic_opt": train_state.critic_opt,
            "norm": train_state.norm,
            "key": train_state.key,
            "iteration": train_state.iteration,
        }

    def save(self, itr: int, train_state: Any, metrics: dict | None = None, is_best: bool = False) -> None:
        state = jax.device_get(self._persistable(train_state))
        path = (self.ckpt_dir / str(itr)).absolute()
        if path.exists():
            shutil.rmtree(path)
        self._saver.save(path, state)
        self._saver.wait_until_finished()
        if metrics is not None:
            with open(self.ckpt_dir / f"metrics_{itr}.json", "w") as f:
                json.dump(metrics, f)
        if is_best:
            if self.best_dir.exists():
                shutil.rmtree(self.best_dir)
            shutil.copytree(path, self.best_dir)

    def latest_iteration(self) -> int | None:
        itrs = [int(p.name) for p in self.ckpt_dir.iterdir() if p.is_dir() and p.name.isdigit()]
        return max(itrs) if itrs else None

    def restore(self, target: Any, itr: int | None = None, best: bool = False) -> Any:
        """Restore into `target` (a TrainState with the right structure);
        returns target with the persisted fields replaced."""
        if best:
            path = self.best_dir.absolute()
        else:
            itr = itr if itr is not None else self.latest_iteration()
            if itr is None:
                raise FileNotFoundError(f"no checkpoints under {self.ckpt_dir}")
            path = (self.ckpt_dir / str(itr)).absolute()
        restored = self._saver.restore(path, self._persistable(target))
        out = target.replace(**restored)
        # The env batch is rebuilt fresh on resume (iteration leaf = 0) while
        # ts.iteration resumes at the checkpointed value; re-sync the per-env
        # curriculum counter so in-env readers see the resumed iteration.
        # Leaf arithmetic (x*0 + itr) preserves any mesh sharding on the leaf.
        env_state = getattr(out, "env_state", None)
        if env_state is not None and hasattr(env_state, "iteration"):
            it = env_state.iteration * 0 + jax.numpy.asarray(out.iteration, env_state.iteration.dtype)
            out = out.replace(env_state=env_state.replace(iteration=it))
        return out


def _has_checkpoints(p: Path) -> bool:
    ck = p / "checkpoints"
    return ck.exists() and any(ck.iterdir())


def find_latest_run(base: str | Path) -> Path | None:
    """Latest run dir under base (reference run_experiment.py:49-84 analog).

    A run counts only if its checkpoints dir is non-empty (a crashed launch
    can leave an empty one behind)."""
    base = Path(base)
    if _has_checkpoints(base):
        return base
    runs = sorted([p for p in base.iterdir() if _has_checkpoints(p)]) if base.exists() else []
    return runs[-1] if runs else None
