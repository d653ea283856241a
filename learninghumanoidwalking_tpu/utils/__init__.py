from learninghumanoidwalking_tpu.utils.config import Configuration, load_yaml

__all__ = ["Configuration", "load_yaml"]
