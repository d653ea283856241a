"""Shared machinery for humanoid environments.

Functional re-design of /root/reference/envs/common/base_humanoid_env.py +
domain_randomization.py: action smoothing, nominal-pose offsets, PD substep
loop, observation history, observation/initialization noise, stochastic
dynamics randomization and perturbation wrenches — all pure functions of
(EnvState, action, PRNG key), with model-mutation DR re-expressed as per-env
DynParams state.

Subclasses provide the robot model, config, task hooks, and observation
layout; this class provides reset/step plumbing and the state-gathering
helpers the reward functions consume (GRF per foot, foot speeds, local root
velocity, self-collision flag — the RobotInterface surface of
/root/reference/envs/common/robot_interface.py used by the tasks).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from learninghumanoidwalking_tpu.envs.base import Env, EnvState
from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.physics.model import DynParams, default_dyn_params
from learninghumanoidwalking_tpu.robots.pd import pd_substeps
from learninghumanoidwalking_tpu.utils import load_yaml, maths

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class HumanoidEnv(Env):
    """Base for H1/JVRC envs. Subclass contract:

    __init__ must set: model, cfg, kp, kd (jnp (nu,)), nominal_qpos (np (nq,)),
    ROOT_BODY/HEAD_BODY names, reward_names, then call _finalize().
    Hooks: _task_reset(key) -> task pytree; _task_step(key, task) -> task;
    _reward(state, stepped_physics, task, target) -> components vector;
    _done(physics) -> bool; _external_obs(task) -> array (may be empty);
    optionally _terrain(task) -> engine.Terrain.
    """

    ROOT_BODY = "pelvis"
    HEAD_BODY = "torso_link"
    include_torque_obs = False

    # ------------------------------------------------------------- finalize

    def _finalize(self) -> None:
        m = self.model
        cfg = self.cfg
        self.sim_dt = float(cfg.sim_dt)
        self.control_dt = float(cfg.control_dt)
        self.frame_skip = int(round(self.control_dt / self.sim_dt))
        self.history_len = int(cfg.obs_history_len or 1)
        self.action_smoothing = float(cfg.action_smoothing or 0.5)
        self.action_size = m.nu

        # factorization-reuse interval R for the batched/kernel physics fast
        # paths (PERFORMANCE.md round-5 lever): the mass-matrix Cholesky +
        # contact basis refresh every R of the frame_skip substeps. Default 5
        # where it divides frame_skip; YAML `physics_reuse_interval` (or the
        # LHW_PHYSICS_REUSE env var — used by tests/the multichip dryrun to
        # pin exact semantics and halve substep compile cost) overrides.
        # Fidelity gates: tests/test_kernel.py (R=5 kernel==batched) and
        # tests/test_mujoco_golden.py (batched R=5 vs MuJoCo).
        import os

        # Terrain models default to R=1: the 16-contact-slot kernels already
        # sit near the 16 MB VMEM scope (see the Woodbury note in
        # ops/substep_kernel.py), and carrying the ~3 MB reuse cache through
        # the inner loop blows it (measured: 18.5 MB scoped-vmem OOM on
        # jvrc_step at R=5). pd_substeps_kernel clamps to 1 for terrain/
        # hfield models regardless; hfield envs (nterrain == 0 at lower time)
        # re-pin physics_reuse = 1 after _finalize.
        reuse_cfg = os.environ.get("LHW_PHYSICS_REUSE") or cfg.physics_reuse_interval
        default = 5 if (self.frame_skip % 5 == 0 and m.nterrain == 0) else 1
        reuse = int(reuse_cfg) if reuse_cfg is not None else default
        self.physics_reuse = reuse if (reuse > 0 and self.frame_skip % reuse == 0) else 1

        # whether _terrain(task) yields real terrain (box envs set this via
        # nterrain; hfield-only envs override to True after _finalize)
        self.has_terrain = m.nterrain > 0

        self.root_idx = m.body_names.index(self.ROOT_BODY)
        self.head_idx = m.body_names.index(self.HEAD_BODY)
        lfoot = set(m.left_foot_geoms)
        rfoot = set(m.right_foot_geoms)
        self.lfoot_idx = m.body_names.index(self.LFOOT_BODY)
        self.rfoot_idx = m.body_names.index(self.RFOOT_BODY)
        # static contact-slot -> foot masks (engine.slots_per_geom per geom)
        # host numpy constants (embedded into jits at trace time; eager
        # device puts cost tunnel roundtrips — see physics/spec.py lower())
        slot_geoms = []
        for gi in m.foot_geoms:
            slot_geoms += [gi] * engine.slots_per_geom(m)
        self._lslot = np.asarray([1.0 if g in lfoot else 0.0 for g in slot_geoms], np.float32)
        self._rslot = np.asarray([1.0 if g in rfoot else 0.0 for g in slot_geoms], np.float32)

        self.act_qpos = np.asarray(m.actuator_qpos)
        self.act_dof = np.asarray(m.actuator_dof)
        self.neutral_pose = np.asarray(self.nominal_qpos[np.asarray(m.actuator_qpos)], np.float32)
        self.robot_mass = float(np.sum(np.asarray(m.body_mass)))

        nrobot = 5 + 2 * m.nu + (m.nu if self.include_torque_obs else 0)
        self.robot_state_len = nrobot
        self.base_obs_len = nrobot + self.num_external_obs
        self.obs_size = self.base_obs_len * self.history_len

        # domain randomization intervals (base_humanoid_env.py:77-94)
        dyn_cfg = cfg.dynamics_randomization
        self.dynrand_interval = (
            int(float(dyn_cfg.interval) / self.control_dt) if (dyn_cfg and dyn_cfg.enable) else 0
        )
        pert_cfg = cfg.perturbation
        self.perturb_interval = (
            int(float(pert_cfg.interval) / self.control_dt) if (pert_cfg and pert_cfg.enable) else 0
        )
        if pert_cfg and pert_cfg.enable:
            self.perturb_bodies = tuple(
                m.body_names.index(b) for b in pert_cfg.bodies if b in m.body_names
            )
            self.perturb_force = float(pert_cfg.force_magnitude)
            self.perturb_torque = float(pert_cfg.torque_magnitude)
        else:
            self.perturb_bodies = ()

        # observation noise (applied per obs group, h1 base.yaml:40-49)
        noise_cfg = cfg.observation_noise
        self.obs_noise_enabled = bool(noise_cfg and noise_cfg.enabled)
        if self.obs_noise_enabled:
            mult = float(noise_cfg.multiplier or 1.0)
            s = noise_cfg.scales
            self.noise_type = str(noise_cfg.type or "uniform")
            scale_vec = np.zeros(nrobot, dtype=np.float32)
            scale_vec[0:2] = float(s.root_orient or 0.0) * mult
            scale_vec[2:5] = float(s.root_ang_vel or 0.0) * mult
            scale_vec[5 : 5 + m.nu] = float(s.motor_pos or 0.0) * mult
            scale_vec[5 + m.nu : 5 + 2 * m.nu] = float(s.motor_vel or 0.0) * mult
            if self.include_torque_obs:
                scale_vec[5 + 2 * m.nu :] = float(s.motor_tau or 0.0) * mult
            self.obs_noise_scale = scale_vec

        # optional learned motor-dynamics hook (robot_interface.py:25-58,
        # :510-533): per-joint nets over a 25-substep (qdot, cmd-tau) history.
        # Default off, like every shipped reference env.
        md_cfg = cfg.motor_dynamics
        self.motor_enabled = bool(md_cfg and md_cfg.enable)
        if self.motor_enabled:
            from learninghumanoidwalking_tpu.robots import motor as motor_mod

            if md_cfg.params_path:
                self.motor_params = motor_mod.load_motor_params(str(md_cfg.params_path), m.nu)
            else:
                self.motor_params = motor_mod.init_motor_params(
                    jax.random.PRNGKey(int(md_cfg.seed or 0)), m.nu
                )

        self.init_noise = float(cfg.init_noise) if cfg.init_noise else 0.0
        # optional actuator randomizations (robot_base.py:5-59: pdrand_k
        # rescales PD gains per control step; sim_bemf resamples a back-EMF
        # torque damping tau_d ~ U(5,40) with p=1/10). Both default off, as in
        # every shipped reference env.
        self.pdrand_k = float(cfg.pdrand_k) if cfg.pdrand_k else 0.0
        self.sim_bemf = bool(cfg.sim_bemf)

    # --------------------------------------------------------------- gather

    def _foot_grf(self, physics) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-foot ground reaction force magnitude: sum over that foot's
        active contact slots of |f| (robot_interface.py:303-325)."""
        fmag = jnp.linalg.norm(physics.contact.force, axis=-1) * physics.contact.mask
        return jnp.sum(fmag * self._lslot), jnp.sum(fmag * self._rslot)

    def _contact_point_z(self, physics) -> jnp.ndarray:
        """Lowest active contact z, 0 when airborne (walking_task.py:102-107)."""
        mask = physics.contact.mask > 0
        z = jnp.where(mask, physics.contact.pos[:, 2], 1e3)
        return jnp.where(jnp.any(mask), jnp.min(z), 0.0)

    def _root_local_vel_xy(self, physics) -> jnp.ndarray:
        v_world = physics.body_vel_world(self.root_idx)
        q = physics.xquat[self.root_idx]
        return maths.quat_rotate_inv(q, v_world)[:2]

    def _motor_pos(self, physics) -> jnp.ndarray:
        return engine.take_rows(physics.qpos, self.model.actuator_qpos)

    def _motor_vel(self, physics) -> jnp.ndarray:
        return engine.take_rows(physics.qvel, self.model.actuator_dof)

    # ---------------------------------------------------------------- state

    def _robot_state(self, physics, key) -> jnp.ndarray:
        """roll, pitch, root angular velocity, motor pos/vel (+ torques),
        with optional per-group observation noise
        (jvrc_base.py:133-138, h1_base.py:100-125)."""
        rpy = maths.quat_to_rpy(physics.qpos[3:7])
        parts = [rpy[:2], physics.qvel[3:6], self._motor_pos(physics), self._motor_vel(physics)]
        if self.include_torque_obs:
            parts.append(physics.act_torque)
        state = jnp.concatenate(parts)
        if self.obs_noise_enabled:
            if self.noise_type == "gaussian":
                noise = jax.random.normal(key, state.shape) * self.obs_noise_scale
            else:
                noise = jax.random.uniform(key, state.shape, minval=-1.0, maxval=1.0) * self.obs_noise_scale
            state = state + noise
        return state

    # ------------------------------------------------- domain randomization

    def _sample_dynamics(self, key) -> DynParams:
        """Per-env dynamics randomization (domain_randomization.py:29-56):
        actuated-joint frictionloss ~ U(0,2) and damping ~ U(0.02,2), body
        mass x U(0.95,1.05), CoM ipos +- 1 cm, all vs model defaults."""
        m = self.model
        base = default_dyn_params(m, self.kp, self.kd)
        if self.dynrand_interval == 0:
            return base
        k1, k2, k3, k4 = jax.random.split(key, 4)
        fl = jax.random.uniform(k1, (m.nv,), minval=0.0, maxval=2.0)
        dp = jax.random.uniform(k2, (m.nv,), minval=0.02, maxval=2.0)
        act_mask_np = np.zeros(m.nv, dtype=np.float32)
        act_mask_np[np.asarray(m.actuator_dof)] = 1.0
        act_mask = jnp.asarray(act_mask_np)
        mass_scale = jax.random.uniform(k3, (m.nbody,), minval=0.95, maxval=1.05)
        ipos_off = jax.random.uniform(k4, (m.nbody, 3), minval=-0.01, maxval=0.01)
        return base.replace(
            dof_frictionloss=jnp.where(act_mask > 0, fl, base.dof_frictionloss),
            dof_damping=jnp.where(act_mask > 0, dp, base.dof_damping),
            body_mass=base.body_mass * mass_scale,
            body_ipos=base.body_ipos + ipos_off * (base.body_mass[:, None] > 0),
        )

    def _sample_perturbation(self, key, dyn: DynParams) -> DynParams:
        """Random persistent wrench on configured bodies, 50% chance zeroed
        immediately (domain_randomization.py:10-26)."""
        if not self.perturb_bodies:
            return dyn
        keys = jax.random.split(key, len(self.perturb_bodies) + 1)
        xfrc = jnp.zeros_like(dyn.xfrc)
        for i, b in enumerate(self.perturb_bodies):
            kf, kt, kz = jax.random.split(keys[i], 3)
            frc = jax.random.uniform(kf, (3,), minval=-self.perturb_force, maxval=self.perturb_force)
            tau = jax.random.uniform(kt, (3,), minval=-self.perturb_torque, maxval=self.perturb_torque)
            zero = jax.random.bernoulli(kz, 0.5)
            wrench = jnp.where(zero, 0.0, 1.0) * jnp.concatenate([frc, tau])
            xfrc = xfrc.at[b].set(wrench)
        return dyn.replace(xfrc=xfrc)

    # ----------------------------------------------------------------- reset

    def _reset_pre(self, key: jnp.ndarray, iteration):
        """Everything before the settle substeps (vmappable)."""
        m = self.model
        k_dyn, k_noise, k_task, k_obs, key = jax.random.split(key, 5)

        dyn = self._sample_dynamics(k_dyn)

        qpos = jnp.asarray(self.nominal_qpos, dtype=jnp.float32)
        if self.init_noise > 0:
            c = self.init_noise * jnp.pi / 180.0
            kz, kr, kj = jax.random.split(k_noise, 3)
            # root height + U(0, 0.02); root roll/pitch +- c; joints +- c
            # (base_humanoid_env.py:278-305)
            qpos = qpos.at[2].add(jax.random.uniform(kz, (), minval=0.0, maxval=0.02))
            rp = jax.random.uniform(kr, (2,), minval=-c, maxval=c)
            quat = maths.rpy_to_quat(jnp.concatenate([rp, jnp.zeros(1)]))
            qpos = jax.lax.dynamic_update_slice(qpos, quat, (3,))
            jn = jax.random.uniform(kj, (m.nu,), minval=-c, maxval=c)
            qpos = qpos + engine.put_rows(m.nq, m.actuator_qpos, jn)

        physics = engine.make_state(m, qpos, jnp.zeros(m.nv))
        task = self._task_reset(k_task, iteration, physics)
        return physics, dyn, task, k_obs, key

    def _reset_post(self, physics, dyn, task, k_obs, key, iteration) -> EnvState:
        """Everything after the settle substeps (vmappable)."""
        m = self.model
        robot_state = self._robot_state(physics, k_obs)
        base_obs = jnp.concatenate([robot_state, self._external_obs(task)])
        obs_history = jnp.zeros((self.history_len, self.base_obs_len)).at[0].set(base_obs)

        if iteration is None:
            iteration = jnp.zeros((), dtype=jnp.int32)
        motor = None
        if self.motor_enabled:
            from learninghumanoidwalking_tpu.robots.motor import init_motor_state

            motor = init_motor_state(m.nu)
        return EnvState(
            physics=physics,
            dyn=dyn,
            task=task,
            obs=obs_history.reshape(-1),
            obs_history=obs_history,
            prev_prediction=jnp.zeros(m.nu),
            prev_action=self.neutral_pose,
            prev_torque=jnp.zeros(m.nu),
            reward=jnp.zeros(()),
            reward_components=jnp.zeros(len(self.reward_names)),
            done=jnp.zeros((), dtype=bool),
            steps=jnp.zeros((), dtype=jnp.int32),
            iteration=jnp.asarray(iteration, dtype=jnp.int32),
            key=key,
            motor=motor,
        )

    def reset(self, key: jnp.ndarray, iteration=None) -> EnvState:
        m = self.model
        physics, dyn, task, k_obs, key = self._reset_pre(key, iteration)
        terrain = self._terrain(task)

        # settle: a few zero-torque substeps to relax initial contact forces
        # (base_humanoid_env.py:267-269)
        def settle(physics, _):
            return engine.step(m, dyn, physics, jnp.zeros(m.nu), self.sim_dt, terrain), None

        physics, _ = jax.lax.scan(settle, physics, None, length=3)
        return self._reset_post(physics, dyn, task, k_obs, key, iteration)

    def reset_batch(self, keys: jnp.ndarray, iteration=None) -> EnvState:
        """Batched reset: vmapped init/task logic around batch-in-lanes
        settle substeps."""
        from learninghumanoidwalking_tpu.physics.batched import pd_substeps_batched

        if iteration is None:
            physics, dyn, task, k_obs, key = jax.vmap(lambda k: self._reset_pre(k, None))(keys)
        else:
            physics, dyn, task, k_obs, key = jax.vmap(self._reset_pre)(keys, iteration)
        batch = keys.shape[0]
        terrain = jax.vmap(self._terrain)(task) if self.has_terrain else None
        if self._use_kernel(batch):
            from learninghumanoidwalking_tpu.ops.substep_kernel import pd_substeps_kernel

            physics = pd_substeps_kernel(
                self.model, dyn, physics, jnp.zeros((batch, self.model.nu)), 3, self.sim_dt, terrain, settle=True
            )
        else:
            physics = pd_substeps_batched(
                self.model, dyn, physics, jnp.zeros((batch, self.model.nu)), 3, self.sim_dt, terrain, settle=True
            )
        if iteration is None:
            return jax.vmap(lambda p, d, t, ko, k: self._reset_post(p, d, t, ko, k, None))(
                physics, dyn, task, k_obs, key
            )
        return jax.vmap(self._reset_post)(physics, dyn, task, k_obs, key, iteration)

    # ------------------------------------------------------------------ step

    def _pre_step(self, state: EnvState, action: jnp.ndarray) -> jnp.ndarray:
        # action smoothing + nominal-pose offsets
        # (base_humanoid_env.py:199-216, robot_base.py:74-80)
        targets = self.action_smoothing * action + (1.0 - self.action_smoothing) * state.prev_prediction
        return targets + self.neutral_pose

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        m = self.model
        full_target = self._pre_step(state, action)
        terrain = self._terrain(state.task)
        if self.motor_enabled:
            from learninghumanoidwalking_tpu.robots.motor import pd_substeps_motor

            physics, motor = pd_substeps_motor(
                m, state.dyn, state.physics, state.motor, self.motor_params,
                full_target, self.frame_skip, self.sim_dt, terrain,
            )
            state = state.replace(motor=motor)
        else:
            physics = pd_substeps(m, state.dyn, state.physics, full_target, self.frame_skip, self.sim_dt, terrain)
        return self._post_step(state, physics, action, full_target)

    def rangefinder(self, state: EnvState, num_rows: int = 4, num_cols: int = 4, spacing: float = 0.4):
        """Downward ray-distance grid under the root body (the reference's
        optional rangefinder sensor array, envs/h1/gen_xml.py:34-47 — shipped
        disabled and unread in every reference config, provided here for
        capability parity; -1 where nothing is hit)."""
        from learninghumanoidwalking_tpu.physics import rangefinder as rf

        sites = rf.site_grid(num_rows, num_cols, spacing)
        terrain = self._terrain(state.task)
        return rf.rangefinder(
            state.physics.xpos[self.root_idx], state.physics.xquat[self.root_idx], terrain, sites
        )

    def render_markers(self, state: EnvState) -> dict | None:
        """Per-frame overlay data for eval rendering (the analog of the
        reference's MarkerDrawer viewer geoms, marker_drawer.py:7-72).
        Subclasses with task targets/terrain override; None = no overlay."""
        return None

    def _use_kernel(self, batch: int) -> bool:
        """Use the pallas mega-kernel on TPU backends (CPU has no Mosaic)."""
        from learninghumanoidwalking_tpu.ops.substep_kernel import kernel_tile

        if kernel_tile(batch) is None:
            return False
        return jax.default_backend() not in ("cpu",)

    def step_batch(self, states: EnvState, actions: jnp.ndarray) -> EnvState:
        """Batched step: batch-in-lanes physics, vmapped task/obs logic."""
        from learninghumanoidwalking_tpu.physics.batched import pd_substeps_batched

        full_target = jax.vmap(self._pre_step)(states, actions)
        terrain = jax.vmap(self._terrain)(states.task) if self.has_terrain else None
        if self.motor_enabled:
            # motor-dynamics history threads through the fused pallas kernel
            # on TPU (weights baked as constants, robots/motor.py semantics);
            # the batch-in-lanes engine is the CPU/odd-batch twin
            if self._use_kernel(actions.shape[0]):
                from learninghumanoidwalking_tpu.ops.substep_kernel import pd_substeps_kernel

                physics, motor = pd_substeps_kernel(
                    self.model, states.dyn, states.physics, full_target,
                    self.frame_skip, self.sim_dt, terrain,
                    motor=(self.motor_params, states.motor),
                    reuse_interval=self.physics_reuse,
                )
            else:
                physics, motor = pd_substeps_batched(
                    self.model, states.dyn, states.physics, full_target,
                    self.frame_skip, self.sim_dt, terrain,
                    motor=(self.motor_params, states.motor),
                    reuse_interval=self.physics_reuse,
                )
            states = states.replace(motor=motor)
            return jax.vmap(self._post_step)(states, physics, actions, full_target)
        if self._use_kernel(actions.shape[0]):
            from learninghumanoidwalking_tpu.ops.substep_kernel import pd_substeps_kernel

            physics = pd_substeps_kernel(
                self.model, states.dyn, states.physics, full_target, self.frame_skip, self.sim_dt, terrain,
                reuse_interval=self.physics_reuse,
            )
        else:
            physics = pd_substeps_batched(
                self.model, states.dyn, states.physics, full_target, self.frame_skip, self.sim_dt, terrain,
                reuse_interval=self.physics_reuse,
            )
        return jax.vmap(self._post_step)(states, physics, actions, full_target)

    def _post_step(self, state: EnvState, physics, action: jnp.ndarray, full_target: jnp.ndarray) -> EnvState:
        m = self.model
        k_task, k_obs, k_dyn, k_pert, k_ev, key = jax.random.split(state.key, 6)

        task = self._task_step(k_task, state.task, physics)
        components = self._reward(state, physics, task, full_target)
        # terminate (and reset) any env whose physics went non-finite instead
        # of letting NaNs poison the batch: NaN comparisons are False, so a
        # blown env would otherwise never trigger done
        bad = jnp.logical_not(
            jnp.logical_and(jnp.all(jnp.isfinite(physics.qpos)), jnp.all(jnp.isfinite(physics.qvel)))
        )
        components = jnp.nan_to_num(components)
        done = jnp.logical_or(self._done(physics), bad)

        robot_state = self._robot_state(physics, k_obs)
        base_obs = jnp.nan_to_num(jnp.concatenate([robot_state, self._external_obs(task)]))
        obs_history, obs = self.stack_history(state.obs_history, base_obs)

        # stochastic DR events (base_humanoid_env.py:221-225)
        dyn = state.dyn
        ev1, ev2, ev3, ev4 = jax.random.split(k_ev, 4)
        if self.pdrand_k > 0:
            k = self.pdrand_k
            kp = self.kp * jax.random.uniform(ev3, (self.model.nu,), minval=1 - k, maxval=1 + k)
            kd = self.kd * jax.random.uniform(ev4, (self.model.nu,), minval=1 - k, maxval=1 + k)
            dyn = dyn.replace(kp=kp, kd=kd)
        if self.sim_bemf:
            kb1, kb2 = jax.random.split(ev3)
            hit = jax.random.randint(kb1, (), 0, 10) == 0
            tau_d = jax.random.uniform(kb2, (self.model.nu,), minval=5.0, maxval=40.0)
            dyn = dyn.replace(bemf_gain=jnp.where(hit, tau_d, dyn.bemf_gain))
        if self.dynrand_interval > 0:
            hit = jax.random.randint(ev1, (), 0, self.dynrand_interval) == 0
            new_dyn = self._sample_dynamics(k_dyn)
            dyn = jax.tree.map(lambda a, b: jnp.where(hit, a, b), new_dyn, dyn)
        if self.perturb_interval > 0 and self.perturb_bodies:
            hit = jax.random.randint(ev2, (), 0, self.perturb_interval) == 0
            new_dyn = self._sample_perturbation(k_pert, dyn)
            dyn = jax.tree.map(lambda a, b: jnp.where(hit, a, b), new_dyn, dyn)

        return state.replace(
            physics=physics,
            dyn=dyn,
            task=task,
            obs=obs,
            obs_history=obs_history,
            prev_prediction=action,
            prev_action=full_target,
            prev_torque=physics.act_torque,
            reward=jnp.sum(components),
            reward_components=components,
            done=done,
            steps=state.steps + 1,
            key=key,
        )

    # ----------------------------------------------------- hooks (override)

    num_external_obs = 0

    def _task_reset(self, key, iteration, physics):
        return None

    def _task_step(self, key, task, physics):
        return task

    def _external_obs(self, task) -> jnp.ndarray:
        return jnp.zeros((0,))

    def _terrain(self, task):
        return None

    def _reward(self, state, physics, task, target) -> jnp.ndarray:
        raise NotImplementedError

    def _done(self, physics) -> jnp.ndarray:
        raise NotImplementedError


def load_config(name: str, path_to_yaml: str | None):
    return load_yaml(path_to_yaml or os.path.join(CONFIG_DIR, name))
