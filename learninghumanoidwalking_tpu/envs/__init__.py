from learninghumanoidwalking_tpu.envs.registry import ENVIRONMENTS, make_env

__all__ = ["ENVIRONMENTS", "make_env"]
