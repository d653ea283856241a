"""JVRC-1 (lower body) robot description.

The reference strips the JVRC-1 MJCF down to 12 actuated leg joints with
arms/waist/head welded in a fixed pose, adds one box collision geom per foot
(size 0.1x0.05x0.01 at (0.029, 0, -0.09778) in the ankle frame), and keeps
hip/knee collision geoms for self-collision
(/root/reference/envs/jvrc/gen_xml.py:42-134). The JVRC description assets are
not vendored; this spec is an original JVRC-class lower body designed so the
reference's config is meaningful: nominal base height 0.81 m with the
half-sitting pose (hip_p -30deg, knee 50deg, ankle_p -24deg,
/root/reference/envs/jvrc/configs/base.yaml) puts the foot soles on the floor.

Joint chain per leg (matching gen_xml.LEG_JOINTS order, right then left):
HIP_P(y) -> HIP_R(x) -> HIP_Y(z) -> KNEE(y) -> ANKLE_R(x) -> ANKLE_P(y).
Body names mirror the reference's *_S convention (jvrc_base.py:30-33) so the
env layer reads the same names (R_ANKLE_P_S = right foot, PELVIS_S = root,
NECK_P_S = head marker).
"""

from learninghumanoidwalking_tpu.physics.spec import Actuator, Body, Geom, Joint, RobotSpec

LEG_JOINTS = [
    "R_HIP_P",
    "R_HIP_R",
    "R_HIP_Y",
    "R_KNEE",
    "R_ANKLE_R",
    "R_ANKLE_P",
    "L_HIP_P",
    "L_HIP_R",
    "L_HIP_Y",
    "L_KNEE",
    "L_ANKLE_R",
    "L_ANKLE_P",
]

THIGH_LEN = 0.36
SHANK_LEN = 0.30
HIP_DROP = 0.11
FOOT_BOX = (0.1, 0.05, 0.01)  # half-sizes (gen_xml.py:123-128)
FOOT_BOX_POS = (0.029, 0.0, -0.09778)


def _leg(prefix: str, sign: float) -> list:
    p = prefix
    return [
        Body(
            name=f"{p}_HIP_P_S",
            parent="PELVIS_S",
            pos=(0.0, sign * 0.096, -HIP_DROP),
            joint=Joint(jtype="hinge", name=f"{p}_HIP_P", axis=(0, 1, 0), damping=0.2, armature=0.01),
            mass=0.5,
            ipos=(0.0, 0.0, 0.0),
            inertia=(0.001, 0.001, 0.001),
        ),
        Body(
            name=f"{p}_HIP_R_S",
            parent=f"{p}_HIP_P_S",
            pos=(0.0, 0.0, 0.0),
            joint=Joint(jtype="hinge", name=f"{p}_HIP_R", axis=(1, 0, 0), damping=0.2, armature=0.01),
            mass=0.7,
            ipos=(0.0, 0.0, -0.05),
            inertia=(0.0015, 0.0015, 0.0015),
        ),
        Body(
            # thigh (hip yaw link; carries the upper-leg inertia)
            name=f"{p}_HIP_Y_S",
            parent=f"{p}_HIP_R_S",
            pos=(0.0, 0.0, 0.0),
            joint=Joint(jtype="hinge", name=f"{p}_HIP_Y", axis=(0, 0, 1), damping=0.2, armature=0.01),
            mass=5.5,
            ipos=(0.0, 0.0, -THIGH_LEN / 2),
            inertia=(0.09, 0.09, 0.02),
            geoms=[Geom(gtype="sphere", name=f"{p}_thigh_prox", size=(0.06,), pos=(0.0, 0.0, -0.18), contact="self")],
        ),
        Body(
            name=f"{p}_KNEE_S",
            parent=f"{p}_HIP_Y_S",
            pos=(0.0, 0.0, -THIGH_LEN),
            joint=Joint(jtype="hinge", name=f"{p}_KNEE", axis=(0, 1, 0), damping=0.2, armature=0.01),
            mass=3.5,
            ipos=(0.0, 0.0, -SHANK_LEN / 2),
            inertia=(0.045, 0.045, 0.01),
            geoms=[Geom(gtype="sphere", name=f"{p}_shank_prox", size=(0.05,), pos=(0.0, 0.0, -0.15), contact="self")],
        ),
        Body(
            name=f"{p}_ANKLE_R_S",
            parent=f"{p}_KNEE_S",
            pos=(0.0, 0.0, -SHANK_LEN),
            joint=Joint(jtype="hinge", name=f"{p}_ANKLE_R", axis=(1, 0, 0), damping=0.2, armature=0.01),
            mass=0.3,
            ipos=(0.0, 0.0, 0.0),
            inertia=(0.0008, 0.0008, 0.0008),
        ),
        Body(
            # foot body (reference R/L_ANKLE_P_S carries the foot collision box)
            name=f"{p}_ANKLE_P_S",
            parent=f"{p}_ANKLE_R_S",
            pos=(0.0, 0.0, 0.0),
            joint=Joint(jtype="hinge", name=f"{p}_ANKLE_P", axis=(0, 1, 0), damping=0.2, armature=0.01),
            mass=1.5,
            ipos=(0.03, 0.0, -0.06),
            inertia=(0.002, 0.004, 0.004),
            geoms=[
                Geom(gtype="box", name=f"{p}_foot", size=FOOT_BOX, pos=FOOT_BOX_POS, friction=1.0, contact="foot"),
                Geom(gtype="sphere", name=f"{p}_foot_prox", size=(0.06,), pos=(0.03, 0.0, -0.06), contact="self"),
            ],
        ),
    ]


def jvrc_spec(nterrain: int = 0, timeconst: float = 0.02, dampratio: float = 1.0) -> RobotSpec:
    pelvis = Body(
        name="PELVIS_S",
        parent="world",
        pos=(0.0, 0.0, 0.81),
        # merged welded upper body (waist/chest/arms/head in the frozen pose,
        # gen_xml.py:88-103): JVRC-1 total ~62 kg, legs carry ~24 kg
        joint=Joint(jtype="free", name="root"),
        mass=38.0,
        ipos=(0.0, 0.0, 0.25),
        inertia=(2.8, 2.4, 0.8),
    )
    head_marker = Body(name="NECK_P_S", parent="PELVIS_S", pos=(0.0, 0.0, 0.55))
    bodies = [pelvis, head_marker] + _leg("R", -1.0) + _leg("L", 1.0)
    return RobotSpec(
        name="jvrc",
        bodies=bodies,
        actuators=[Actuator(joint=j, gear=1.0) for j in LEG_JOINTS],
        left_foot_geoms=["L_foot"],
        right_foot_geoms=["R_foot"],
        self_collision_pairs=[
            ("L_foot_prox", "R_foot_prox"),
            ("L_shank_prox", "R_shank_prox"),
            ("L_foot_prox", "R_shank_prox"),
            ("R_foot_prox", "L_shank_prox"),
            ("L_thigh_prox", "R_thigh_prox"),
        ],
        nterrain=nterrain,
        timeconst=timeconst,
        dampratio=dampratio,
    )


NOMINAL_HEIGHT = 0.81
HALF_SITTING_POSE_DEG = [-30, 0, 0, 50, 0, -24, -30, 0, 0, 50, 0, -24]
