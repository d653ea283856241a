"""Unitree H1 (lower body) robot description.

The reference builds its H1 model from the mujoco_menagerie MJCF with arm and
waist joints removed (welded) and 10 actuated leg joints
(/root/reference/envs/h1/gen_xml.py:9-30,64-126), pelvis/torso masses
corrected to 8.89/21.289 kg (/root/reference/envs/h1/h1_base.py:40-41). The
menagerie assets are not vendored here; this spec is an original H1-class
lower-body description designed so that the reference's configuration is
meaningful: nominal base height 0.98 m with half-sitting pose
(hip_pitch -0.2, knee 0.6, ankle -0.4) puts the foot soles on the floor
(/root/reference/envs/h1/configs/base.yaml).

Joint order (actuators) matches gen_xml.LEG_JOINTS: left then right;
within a leg: hip_yaw(z), hip_roll(x), hip_pitch(y), knee(y), ankle(y).

Welded upper body (torso + arms + head) is merged into the pelvis body;
`torso_link` is kept as a massless marker body so upper-body rewards
(head-over-root alignment) have a reference point.
"""

from learninghumanoidwalking_tpu.physics.spec import Actuator, Body, Geom, Joint, RobotSpec

LEG_JOINTS = [
    "left_hip_yaw",
    "left_hip_roll",
    "left_hip_pitch",
    "left_knee",
    "left_ankle",
    "right_hip_yaw",
    "right_hip_roll",
    "right_hip_pitch",
    "right_knee",
    "right_ankle",
]

# segment lengths chosen so the half-sitting pose stands on the floor at 0.98 m
THIGH_LEN = 0.39
SHANK_LEN = 0.39
HIP_DROP = 0.13  # pelvis origin -> hip_yaw joint
HIP_ROLL_DROP = 0.05  # hip_yaw -> hip_pitch cluster
ANKLE_TO_SOLE = 0.06
FOOT_BOX = (0.10, 0.04, 0.012)  # half-sizes
FOOT_BOX_POS = (0.045, 0.0, -(ANKLE_TO_SOLE - FOOT_BOX[2]))


def _leg(side: str, sign: float) -> list:
    s = side
    return [
        Body(
            name=f"{s}_hip_yaw_link",
            parent="pelvis",
            pos=(0.0, sign * 0.09, -HIP_DROP),
            joint=Joint(jtype="hinge", name=f"{s}_hip_yaw", axis=(0, 0, 1), damping=0.1, armature=0.01),
            mass=1.0,
            ipos=(0.0, 0.0, -0.02),
            inertia=(0.002, 0.002, 0.002),
        ),
        Body(
            name=f"{s}_hip_roll_link",
            parent=f"{s}_hip_yaw_link",
            pos=(0.0, 0.0, -HIP_ROLL_DROP),
            joint=Joint(jtype="hinge", name=f"{s}_hip_roll", axis=(1, 0, 0), damping=0.1, armature=0.01),
            mass=1.2,
            ipos=(0.0, 0.0, 0.0),
            inertia=(0.002, 0.002, 0.002),
        ),
        Body(
            name=f"{s}_thigh",
            parent=f"{s}_hip_roll_link",
            pos=(0.0, 0.0, 0.0),
            joint=Joint(jtype="hinge", name=f"{s}_hip_pitch", axis=(0, 1, 0), damping=0.1, armature=0.01),
            mass=4.5,
            ipos=(0.0, 0.0, -THIGH_LEN / 2),
            inertia=(0.065, 0.065, 0.012),
            geoms=[Geom(gtype="sphere", name=f"{s}_thigh_prox", size=(0.05,), pos=(0.0, 0.0, -0.2), contact="self")],
        ),
        Body(
            name=f"{s}_shank",
            parent=f"{s}_thigh",
            pos=(0.0, 0.0, -THIGH_LEN),
            joint=Joint(jtype="hinge", name=f"{s}_knee", axis=(0, 1, 0), damping=0.1, armature=0.01),
            mass=2.8,
            ipos=(0.0, 0.0, -SHANK_LEN / 2),
            inertia=(0.038, 0.038, 0.006),
            geoms=[Geom(gtype="sphere", name=f"{s}_shank_prox", size=(0.04,), pos=(0.0, 0.0, -0.2), contact="self")],
        ),
        Body(
            # ankle body carries the foot (reference body name right/left_ankle_link)
            name=f"{s}_ankle_link",
            parent=f"{s}_shank",
            pos=(0.0, 0.0, -SHANK_LEN),
            joint=Joint(jtype="hinge", name=f"{s}_ankle", axis=(0, 1, 0), damping=0.1, armature=0.01),
            mass=0.8,
            ipos=(0.04, 0.0, -0.03),
            inertia=(0.001, 0.003, 0.003),
            geoms=[
                Geom(gtype="box", name=f"{s}_foot", size=FOOT_BOX, pos=FOOT_BOX_POS, friction=1.0, contact="foot"),
                Geom(gtype="sphere", name=f"{s}_foot_prox", size=(0.06,), pos=(0.04, 0.0, -0.03), contact="self"),
            ],
        ),
    ]


def h1_spec() -> RobotSpec:
    pelvis = Body(
        name="pelvis",
        parent="world",
        pos=(0.0, 0.0, 0.98),
        joint=Joint(jtype="free", name="root"),
        # merged pelvis(8.89) + torso_link(21.289, reference h1_base.py:40-41)
        # + welded arms (~8.3): upper-body mass rides on the pelvis
        mass=38.5,
        ipos=(0.0, 0.0, 0.22),
        inertia=(2.2, 2.0, 0.45),
    )
    torso_marker = Body(name="torso_link", parent="pelvis", pos=(0.0, 0.0, 0.4))
    bodies = [pelvis, torso_marker] + _leg("left", 1.0) + _leg("right", -1.0)
    return RobotSpec(
        name="h1",
        bodies=bodies,
        actuators=[Actuator(joint=j, gear=1.0) for j in LEG_JOINTS],
        left_foot_geoms=["left_foot"],
        right_foot_geoms=["right_foot"],
        self_collision_pairs=[
            ("left_foot_prox", "right_foot_prox"),
            ("left_shank_prox", "right_shank_prox"),
            ("left_foot_prox", "right_shank_prox"),
            ("right_foot_prox", "left_shank_prox"),
            ("left_thigh_prox", "right_thigh_prox"),
        ],
    )


NOMINAL_HEIGHT = 0.98
HALF_SITTING_POSE = [0.0, 0.0, -0.2, 0.6, -0.4, 0.0, 0.0, -0.2, 0.6, -0.4]
