"""Cartpole robot description.

Behavioral match for the reference's cartpole model
(/root/reference/envs/cartpole/cartpole.xml): a 2-DoF cart (slide, x) + pole
(hinge, y) with inertia derived from geoms (inertiafromgeom semantics), joint
damping 0.05, and a gear-50 force motor on the slider. The model has no
contacts (all reference geoms have contype=0).
"""

from learninghumanoidwalking_tpu.physics.spec import Actuator, Body, Geom, Joint, RobotSpec


def cartpole_spec() -> RobotSpec:
    return RobotSpec(
        name="cartpole",
        bodies=[
            Body(
                name="cart",
                parent="world",
                pos=(0.0, 0.0, 0.0),
                joint=Joint(jtype="slide", name="slider", axis=(1, 0, 0), damping=0.05),
                geoms=[Geom(gtype="box", name="cart", size=(0.2, 0.1, 0.05))],
            ),
            Body(
                name="pole",
                parent="cart",
                pos=(0.0, 0.0, 0.0),
                joint=Joint(jtype="hinge", name="hinge", axis=(0, 1, 0), damping=0.05),
                # reference: capsule fromto (0,0,0)-(0,0,0.6), r=0.045
                geoms=[Geom(gtype="capsule", name="cpole", size=(0.045, 0.3), pos=(0.0, 0.0, 0.3))],
            ),
        ],
        actuators=[Actuator(joint="slider", gear=50.0)],
    )
