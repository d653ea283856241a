from learninghumanoidwalking_tpu.physics.model import DynParams, Model, PhysicsState
from learninghumanoidwalking_tpu.physics.spec import Actuator, Body, Geom, Joint, RobotSpec, lower

__all__ = [
    "Actuator",
    "Body",
    "DynParams",
    "Geom",
    "Joint",
    "Model",
    "PhysicsState",
    "RobotSpec",
    "lower",
]
