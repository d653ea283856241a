"""Learned motor-dynamics hook for the PD substep loop.

The reference optionally replaces the commanded joint torque with the output
of per-joint learned motor models fed by a rolling 25-step history of
(joint velocity, commanded torque)
(/root/reference/envs/common/robot_interface.py:25-58 `motor_nets_forward`,
:510-533 `set_motor_torque(motor_dyn_fwd=True)`): while the history buffer
is filling the command passes through unchanged; once full, the buffers are
appended every 2nd substep and each joint's net maps
concat(qdot_hist[:, j], ctau_hist[:, j]) -> actual torque.

TPU-native equivalent: one Flax-style MLP with parameters STACKED over
joints (a (nu, ...) leading axis on every weight) applied to all joints in
one batched einsum — no per-joint Python loop, no TorchScript. The history
is explicit state (MotorState pytree) carried in EnvState and threaded
through the substep scan. Default OFF (`motor_dynamics.enable` in the env
YAML); the reference ships no trained nets either, so parameters initialize
to a near-passthrough map unless loaded from an .npz.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.physics.model import DynParams, Model, PhysicsState

HIST_LEN = 25  # reference buffer maxlen (robot_interface.py:34-35)


@struct.dataclass
class MotorState:
    """Rolling (qdot, commanded-torque) history, newest last."""

    qdot_hist: jnp.ndarray  # (HIST_LEN, nu)
    ctau_hist: jnp.ndarray  # (HIST_LEN, nu)
    count: jnp.ndarray  # () int32 substep counter


def init_motor_state(nu: int) -> MotorState:
    return MotorState(
        qdot_hist=jnp.zeros((HIST_LEN, nu)),
        ctau_hist=jnp.zeros((HIST_LEN, nu)),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def init_motor_params(key, nu: int, hidden: tuple = (32, 32)) -> dict:
    """Per-joint MLP params, stacked over joints.

    Initialized so the net starts as approximately the identity map on the
    newest commanded torque (pass-through + small noise): training from a
    sane starting point is the caller's concern, but a freshly-initialized
    hook must not destroy the control loop it is inserted into.
    """
    sizes = (2 * HIST_LEN,) + tuple(hidden) + (1,)
    params = {}
    for li in range(len(sizes) - 1):
        key, k = jax.random.split(key)
        w = 0.01 * jax.random.normal(k, (nu, sizes[li], sizes[li + 1]))
        params[f"w{li}"] = w
        params[f"b{li}"] = jnp.zeros((nu, sizes[li + 1]))
    # skip connection weight on the newest ctau entry makes init ~ identity
    params["skip"] = jnp.ones((nu,))
    params["n_layers"] = len(sizes) - 1
    return params


def motor_forward(params: dict, qdot_hist: jnp.ndarray, ctau_hist: jnp.ndarray) -> jnp.ndarray:
    """(HIST_LEN, nu) x2 -> (nu,) actual joint torques."""
    x = jnp.concatenate([qdot_hist.T, ctau_hist.T], axis=1)  # (nu, 2H)
    n_layers = int(params["n_layers"])
    for li in range(n_layers):
        x = jnp.einsum("ni,nio->no", x, params[f"w{li}"]) + params[f"b{li}"]
        if li < n_layers - 1:
            x = jnp.tanh(x)
    return params["skip"] * ctau_hist[-1] + x[:, 0]


def motor_substep_torque(
    params: dict, state: MotorState, qdot: jnp.ndarray, cmd_tau: jnp.ndarray
) -> tuple[jnp.ndarray, MotorState]:
    """One substep of the reference's motor_nets_forward contract."""
    warm = state.count < HIST_LEN
    update = jnp.logical_or(warm, state.count % 2 == 0)

    def push(hist, new):
        rolled = jnp.concatenate([hist[1:], new[None]])
        return jnp.where(update, rolled, hist)

    qdot_hist = push(state.qdot_hist, qdot)
    ctau_hist = push(state.ctau_hist, cmd_tau)
    act_tau = jnp.where(warm, cmd_tau, motor_forward(params, qdot_hist, ctau_hist))
    return act_tau, MotorState(qdot_hist=qdot_hist, ctau_hist=ctau_hist, count=state.count + 1)


def motor_forward_b(params: dict, qdot_hist: jnp.ndarray, ctau_hist: jnp.ndarray) -> jnp.ndarray:
    """Trailing-batch motor_forward: (HIST_LEN, nu, B) histories -> (nu, B)
    torques. Same math as motor_forward with the batch riding in the last
    axis (the batched engine's lane layout, physics/batched.py)."""
    x = jnp.concatenate([qdot_hist, ctau_hist], axis=0).transpose(1, 0, 2)  # (nu, 2H, B)
    n_layers = int(params["n_layers"])
    for li in range(n_layers):
        x = jnp.einsum("nib,nio->nob", x, params[f"w{li}"]) + params[f"b{li}"][:, :, None]
        if li < n_layers - 1:
            x = jnp.tanh(x)
    return params["skip"][:, None] * ctau_hist[-1] + x[:, 0, :]


def motor_substep_torque_b(
    params: dict,
    qdot_hist: jnp.ndarray,  # (HIST_LEN, nu, B)
    ctau_hist: jnp.ndarray,  # (HIST_LEN, nu, B)
    count: jnp.ndarray,  # (B,) int32
    qdot: jnp.ndarray,  # (nu, B)
    cmd_tau: jnp.ndarray,  # (nu, B)
):
    """Trailing-batch twin of motor_substep_torque (same warmup/every-2nd
    update contract, robot_interface.py:510-533)."""
    warm = count < HIST_LEN
    update = jnp.logical_or(warm, count % 2 == 0)

    def push(hist, new):
        rolled = jnp.concatenate([hist[1:], new[None]])
        return jnp.where(update[None, None, :], rolled, hist)

    qdot_hist = push(qdot_hist, qdot)
    ctau_hist = push(ctau_hist, cmd_tau)
    act_tau = jnp.where(warm[None, :], cmd_tau, motor_forward_b(params, qdot_hist, ctau_hist))
    return act_tau, qdot_hist, ctau_hist, count + 1


def pd_substeps_motor(
    model: Model,
    dyn: DynParams,
    physics: PhysicsState,
    motor_state: MotorState,
    motor_params: dict,
    target: jnp.ndarray,
    frame_skip: int,
    sim_dt: float,
    terrain: engine.Terrain | None = None,
) -> tuple[PhysicsState, MotorState]:
    """robots.pd.pd_substeps with the motor-dynamics hook in the loop
    (robot_base.py:41-62 with motor_dyn_fwd=True)."""

    def substep(carry, _):
        physics, mstate = carry
        q = engine.take_rows(physics.qpos, model.actuator_qpos)
        v = engine.take_rows(physics.qvel, model.actuator_dof)
        tau = dyn.kp * (target - q) - dyn.kd * v
        tau = tau - dyn.bemf_gain * v
        tau, mstate = motor_substep_torque(motor_params, mstate, v, tau)
        ctrl = tau / model.actuator_gear
        return (engine.step(model, dyn, physics, ctrl, sim_dt, terrain), mstate), None

    (physics, motor_state), _ = jax.lax.scan(substep, (physics, motor_state), None, length=frame_skip)
    return physics, motor_state


def load_motor_params(path: str, nu: int) -> dict:
    """Load stacked per-joint params from an .npz (the analog of the
    reference's per-joint trained_jit.pth directory)."""
    data = np.load(path)
    params = {k: jnp.asarray(data[k]) for k in data.files if k != "n_layers"}
    params["n_layers"] = int(data["n_layers"])
    assert params["w0"].shape[0] == nu, (params["w0"].shape, nu)
    return params
