"""Environment registry (analog of /root/reference/envs/__init__.py:13-19).

Maps env names to (module, class) pairs, imported lazily so that importing
the registry stays cheap. Tests parametrize over this dict, so new envs are
auto-covered (reference tests/conftest.py:23-49 pattern).
"""

from __future__ import annotations

import importlib

ENVIRONMENTS: dict[str, tuple[str, str]] = {
    "cartpole": ("learninghumanoidwalking_tpu.envs.cartpole", "CartpoleEnv"),
    "h1": ("learninghumanoidwalking_tpu.envs.h1_stand", "H1StandEnv"),
    "h1_walk": ("learninghumanoidwalking_tpu.envs.h1_walk", "H1WalkEnv"),
    "jvrc_walk": ("learninghumanoidwalking_tpu.envs.jvrc_walk", "JvrcWalkEnv"),
    "jvrc_step": ("learninghumanoidwalking_tpu.envs.jvrc_step", "JvrcStepEnv"),
    "jvrc_walk_rough": ("learninghumanoidwalking_tpu.envs.jvrc_walk_rough", "JvrcWalkRoughEnv"),
}


def make_env(name: str, path_to_yaml: str | None = None):
    if name.startswith("mjcf:"):
        # env built from an MJCF robot description file (the reference's
        # model-ingest path, envs/common/mujoco_env.py:24-26); the YAML names
        # contact/observation roles — see configs/mjcf_base.yaml
        from learninghumanoidwalking_tpu.envs.mjcf_env import MjcfWalkEnv

        return MjcfWalkEnv(name[len("mjcf:"):], path_to_yaml)
    if name not in ENVIRONMENTS:
        raise ValueError(f"unknown env {name!r}; available: {sorted(ENVIRONMENTS)}")
    module_name, cls_name = ENVIRONMENTS[name]
    cls = getattr(importlib.import_module(module_name), cls_name)
    return cls(path_to_yaml)
