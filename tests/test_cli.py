"""End-to-end CLI coverage: run_experiment.py train + eval as subprocesses.

The reference's whole user surface is its CLI (reference run_experiment.py:
103-293); every other test here drives the library directly, so a CLI
regression (argparse wiring, checkpoint layout, eval discovery) would
otherwise only surface in real training runs. Uses cartpole (small compiles,
exercises the RunningMeanStd path) and LHW_PLATFORM=cpu (the axon plugin
ignores JAX_PLATFORMS).
"""

import pytest

pytestmark = pytest.mark.fast  # cold-fast lane: no humanoid-scale compiles

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout=900):
    env = dict(os.environ)
    env["LHW_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.run(
        [sys.executable, str(REPO / "run_experiment.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )


def test_cli_train_then_eval(tmp_path):
    logdir = tmp_path / "runs"
    r = _run(
        [
            "train", "--env", "cartpole", "--n-itr", "2", "--num-envs", "64",
            "--rollout-len", "32", "--minibatch-size", "512", "--eval-freq", "1",
            "--logdir", str(logdir),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "itr     1" in r.stdout, r.stdout[-2000:]

    runs = list(logdir.iterdir())
    assert len(runs) == 1
    run_dir = runs[0]
    exp = json.loads((run_dir / "experiment.json").read_text())
    assert exp["env"] == "cartpole"
    assert (run_dir / "checkpoints").is_dir() and any((run_dir / "checkpoints").iterdir())
    assert any(p.name.startswith("events.out") for p in run_dir.iterdir()), "no TB event file"

    out = tmp_path / "traj.npz"
    r2 = _run(["eval", "--path", str(logdir), "--episodes", "1", "--max-steps", "50", "--out", str(out)])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "episode 0" in r2.stdout
    assert out.exists()
