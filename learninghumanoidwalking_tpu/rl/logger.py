"""TensorBoard training logger.

Replaces /root/reference/rl/utils/logger.py:11-132 with the same tag
inventory (Loss/*, Train/*, Eval/*, Time/*) via tensorboardX.
"""

from __future__ import annotations

from pathlib import Path


class TrainingLogger:
    def __init__(self, logdir: str | Path, flush_secs: int = 10):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(str(logdir), flush_secs=flush_secs)

    def log_training(self, itr: int, metrics: dict) -> None:
        tag_map = {
            "actor_loss": "Loss/actor",
            "critic_loss": "Loss/critic",
            "mirror_loss": "Loss/mirror",
            "imitation_loss": "Loss/imitation",
            "entropy": "Loss/entropy",
            "approx_kl": "Loss/approx_kl",
            "clip_fraction": "Loss/clip_fraction",
            "mean_reward": "Train/mean_reward",
            "episode_reward": "Train/mean_episode_reward",
            "mean_episode_length": "Train/mean_episode_length",
            "mean_noise_std": "Train/mean_noise_std",
            "episodes_finished": "Train/episodes_finished",
        }
        for key, tag in tag_map.items():
            if key in metrics:
                self.writer.add_scalar(tag, metrics[key], itr)

    def log_eval(self, itr: int, metrics: dict) -> None:
        self.writer.add_scalar("Eval/mean_reward", metrics["eval_mean_reward"], itr)
        self.writer.add_scalar("Eval/mean_episode_length", metrics["eval_mean_episode_length"], itr)

    def log_timing(self, itr: int, fps: float, sample_time: float, optimize_time: float, total_elapsed: float) -> None:
        self.writer.add_scalar("Time/fps", fps, itr)
        self.writer.add_scalar("Time/sample_time", sample_time, itr)
        self.writer.add_scalar("Time/optimize_time", optimize_time, itr)
        self.writer.add_scalar("Time/total_elapsed", total_elapsed, itr)

    def close(self) -> None:
        self.writer.close()
