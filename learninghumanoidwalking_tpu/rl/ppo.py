"""On-device PPO (clip objective) — the TPU-native replacement for the
reference's Ray-sampled PPO (/root/reference/rl/algos/ppo.py).

The reference's architecture is: N CPU worker processes each stepping one
MuJoCo env, a per-iteration weight broadcast + trajectory gather over the Ray
object store, and a torch SGD loop (ppo.py:215-297,428-641). Here the entire
iteration — rollout (scan over T, vmap over B envs), GAE, advantage
normalization, and K epochs of minibatched clip updates with the
mirror-symmetry and imitation losses — is ONE jitted function with zero
host<->device transfer except scalar metrics. Multi-chip: the env batch is
sharded over the mesh data axis and parameters are replicated; XLA inserts
the gradient all-reduce (see parallel/mesh.py).

Loss parity with the reference update (ppo.py:299-406): clipped surrogate,
value MSE, entropy bonus, mirror loss pi(M_o s) vs M_a pi(s), imitation loss
through a frozen expert, approximate reverse KL for logging, grad-norm clip
0.5, separate Adam optimizers for actor and critic.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from learninghumanoidwalking_tpu.envs.base import Env, EnvState
from learninghumanoidwalking_tpu.rl import networks
from learninghumanoidwalking_tpu.rl.gae import compute_gae
from learninghumanoidwalking_tpu.rl.imitation import imitation_loss
from learninghumanoidwalking_tpu.rl.mirror import obs_symmetry_matrix, symmetry_matrix
from learninghumanoidwalking_tpu.rl.normalize import RunningNorm, init_norm, update_norm
from flax import struct


@dataclasses.dataclass
class PPOConfig:
    """Hyperparameters (defaults = reference run_experiment.py:156-200)."""

    n_itr: int = 20000
    lr: float = 3e-4
    eps: float = 1e-5  # Adam epsilon
    gamma: float = 0.99
    lam: float = 0.95
    std_dev: float = 0.223
    learn_std: bool = False
    entropy_coeff: float = 0.0
    clip: float = 0.2
    minibatch_size: int = 4096  # samples per minibatch (TPU-friendly default)
    epochs: int = 3
    num_envs: int = 512  # replaces num_procs: parallel env batch on device
    rollout_len: int = 64  # steps per env per iteration
    max_traj_len: int = 400  # episode truncation horizon
    max_grad_norm: float = 0.5
    mirror_coeff: float = 0.4
    use_mirror: bool = True  # --no-mirror disables
    imitate_coeff: float = 0.3
    eval_freq: int = 100
    recurrent: bool = False
    input_norm_iters: int = 5  # obs-norm warmup iterations (ppo.py:441-457)
    seed: int = 0
    # minibatch construction: "slice" visits fixed contiguous chunks of the
    # (time-major, env-minor) batch in a random order — gather-free, the
    # per-minibatch random gathers were ~80% of the update segment's device
    # time on the axon runtime (each chunk is one rollout time-step across
    # the full i.i.d. env batch, so chunks are themselves unbiased samples).
    # "shuffle" reproduces the reference's per-epoch full random permutation
    # (ppo.py:504-539) at that gather cost.
    minibatch_scheme: str = "slice"
    # compute precision of the FF net hidden matmuls ("bfloat16" runs them
    # single-pass on the TPU MXU; params and output heads stay float32)
    net_dtype: str = "bfloat16"

    @property
    def batch_size(self) -> int:
        return self.num_envs * self.rollout_len


@struct.dataclass
class TrainState:
    actor_params: Any
    critic_params: Any
    actor_opt: Any
    critic_opt: Any
    norm: RunningNorm
    env_state: EnvState  # batched (num_envs leading dim)
    key: jnp.ndarray
    iteration: jnp.ndarray  # () int32
    # recurrent-policy hidden states, () for FF policies
    actor_carry: Any = ()
    critic_carry: Any = ()


@struct.dataclass
class Batch:
    obs: jnp.ndarray  # (T, B, O)
    actions: jnp.ndarray  # (T, B, A)
    log_probs: jnp.ndarray  # (T, B)
    advantages: jnp.ndarray  # (T, B)
    returns: jnp.ndarray  # (T, B)
    # recurrent extras (None for FF): episode boundaries + rollout-start
    # hidden states for BPTT replay
    done: Any = None  # (T, B)
    actor_carry0: Any = None
    critic_carry0: Any = None


def _tree_where(pred: jnp.ndarray, a, b):
    """Select pytree a where pred else b; pred is (B,) and leaves are (B, ...)."""

    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)

    return jax.tree.map(sel, a, b)


class PPO:
    """PPO trainer bound to one env definition.

    Construction mirrors reference PPO.__init__ (network setup, obs
    normalization selection, expert/projector wiring); `train()` mirrors
    PPO.train. All per-iteration compute is inside `self._train_iter` (jitted
    once, reused every iteration).
    """

    def __init__(
        self,
        env: Env,
        config: PPOConfig,
        imitation_projector=None,
        expert_apply: Callable | None = None,
        expert_params=None,
        mesh=None,
    ):
        self.env = env
        self.cfg = config
        self.mesh = mesh

        if config.recurrent:
            self.actor_def = networks.GaussianLSTMActor(
                action_dim=env.action_size,
                init_std=config.std_dev,
                learn_std=config.learn_std,
                bounded=False,
            )
            self.critic_def = networks.LSTMCritic()
            self.hidden_sizes = tuple(self.actor_def.hidden)
        else:
            net_dtype = jnp.dtype(config.net_dtype)
            self.actor_def = networks.GaussianActor(
                action_dim=env.action_size,
                init_std=config.std_dev,
                learn_std=config.learn_std,
                bounded=False,
                dtype=net_dtype,
            )
            self.critic_def = networks.Critic(dtype=net_dtype)

        # apply_if_finite: a single blown minibatch must not poison the
        # parameters (the env layer also terminates non-finite envs)
        self.actor_tx = optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(config.max_grad_norm),
                optax.adam(config.lr, eps=config.eps),
            ),
            max_consecutive_errors=100,
        )
        self.critic_tx = optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(config.max_grad_norm),
                optax.adam(config.lr, eps=config.eps),
            ),
            max_consecutive_errors=100,
        )

        # mirror-symmetry matrices (SymmetricEnv equivalent)
        self.obs_mirror = None
        self.act_mirror = None
        if config.use_mirror and env.mirrored_obs is not None:
            self.obs_mirror = jnp.asarray(
                obs_symmetry_matrix(env.mirrored_obs, env.clock_inds, env.history_len)
            )
            self.act_mirror = jnp.asarray(symmetry_matrix(env.mirrored_acts))

        self.imitation_projector = imitation_projector
        self.expert_apply = expert_apply
        self.expert_params = expert_params

        # two jitted segments (rollout+GAE vs update) so Time/sample_time and
        # Time/optimize_time are real wall-clock splits (reference
        # ppo.py:480-481,568-569); _train_iter composes them.
        # Donation: only the TrainState flowing INTO the optimize segment is
        # donated — it is the intermediate produced by _sample_iter inside the
        # same iteration, every leaf aliases an output (params->updated
        # params, env_state/norm pass through), and no caller can hold a
        # reference to it. _sample_iter takes the caller's TrainState and
        # must leave it readable (checkpoint comparisons, tests); the rollout
        # batch has no shape-matching output in the update, so donating it
        # buys nothing (XLA "donated buffers were not usable").
        self._sample_iter = jax.jit(self._sample_iteration)
        self._optimize_iter = jax.jit(self._optimize_iteration, donate_argnums=(0,))
        self._eval_iter = jax.jit(self._eval_rollout)
        self._warmup_iter = jax.jit(self._warmup_iteration)

    # ------------------------------------------------------------------ init

    def init_state(self, key: jnp.ndarray) -> TrainState:
        k_actor, k_critic, k_env, key = jax.random.split(key, 4)
        dummy_obs = jnp.zeros((1, self.env.obs_size))
        if self.cfg.recurrent:
            dummy_carry = networks.LSTMCore.initial_carry(self.hidden_sizes, (1,))
            actor_params = self.actor_def.init(k_actor, dummy_carry, dummy_obs)
            critic_params = self.critic_def.init(k_critic, dummy_carry, dummy_obs)
            actor_carry = networks.LSTMCore.initial_carry(self.hidden_sizes, (self.cfg.num_envs,))
            critic_carry = networks.LSTMCore.initial_carry(self.hidden_sizes, (self.cfg.num_envs,))
        else:
            actor_params = self.actor_def.init(k_actor, dummy_obs)
            critic_params = self.critic_def.init(k_critic, dummy_obs)
            actor_carry = ()
            critic_carry = ()

        if self.env.obs_mean is not None:
            norm = init_norm(None, self.env.obs_mean, self.env.obs_std)
        else:
            norm = init_norm((self.env.obs_size,))

        env_keys = jax.random.split(k_env, self.cfg.num_envs)
        # jit the init reset on accelerators: eager dispatch of its hundreds
        # of small ops costs minutes of tunnel roundtrips on the axon
        # runtime at large B (and the jitted program lands in the persistent
        # compile cache). On CPU (tests) eager is faster than compiling.
        if jax.default_backend() == "cpu":
            env_state = self.env.reset_batch(env_keys)
        else:
            env_state = jax.jit(self.env.reset_batch)(env_keys)
        return TrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            norm=norm,
            env_state=env_state,
            key=key,
            iteration=jnp.zeros((), dtype=jnp.int32),
            actor_carry=actor_carry,
            critic_carry=critic_carry,
        )

    # --------------------------------------------------------------- rollout

    def _policy(self, actor_params, norm, obs):
        return self.actor_def.apply(actor_params, norm.normalize(obs))

    def _value(self, critic_params, norm, obs):
        return self.critic_def.apply(critic_params, norm.normalize(obs))

    @staticmethod
    def _mask_carry(carry, done):
        """Zero the hidden state of finished envs (the reference re-inits
        hidden per trajectory, actor.py:268-272)."""
        return jax.tree.map(lambda x: jnp.where(done[:, None], 0.0, x), carry)

    def _rollout(self, ts: TrainState, key, deterministic: bool):
        """Scan rollout of cfg.rollout_len steps over the persistent env batch.

        Episodes persist across iterations (reference rollout_worker.py:63-69)
        and truncate at max_traj_len with a value bootstrap
        (rollout_worker.py:162-167).
        """
        if self.cfg.recurrent:
            return self._rollout_recurrent(ts, key, deterministic)
        cfg = self.cfg

        # Reset pool: fresh per-iteration reset states computed ONCE, reused
        # for every env that finishes during this rollout (brax-style
        # auto-reset). A per-step fresh reset costs 3 settle substeps + FK
        # per control step; the pool amortizes it 16x. The pool is ROTATED
        # across the batch by the iteration index, so env i draws a different
        # pool entry (init noise / task draw / terrain) each iteration — the
        # reference resets fresh each time (rollout_worker.py:171-177) and
        # the rotation removes the iteration-to-iteration correlation a
        # static pool would introduce. The rotation happens ONCE out here,
        # not per scan step: rolling the full env-state pytree inside the
        # step loop cost a whole-batch copy of every leaf on the sampling
        # hot path. The one case this loses — an env finishing twice within
        # one rollout re-draws the same entry — is already covered by the
        # PRNG key being refreshed at use, so a re-drawn entry diverges
        # immediately.
        key, k_pool = jax.random.split(key)
        pool_keys = jax.random.split(k_pool, cfg.num_envs)
        reset_pool = self.env.reset_batch(pool_keys, jnp.broadcast_to(ts.iteration, (cfg.num_envs,)))
        reset_pool = jax.tree.map(lambda x: jnp.roll(x, ts.iteration, axis=0), reset_pool)

        # V(s_t) is carried: at t=0 it is critic(obs_0); afterwards it is the
        # previous step's V(s_{t+1}) when the episode continued and the
        # (precomputed) pool value when it reset — identical values to
        # re-evaluating critic(obs_t) in-step, one net forward cheaper
        pool_values = self._value(ts.critic_params, ts.norm, reset_pool.obs)
        value0 = self._value(ts.critic_params, ts.norm, ts.env_state.obs)

        def step_fn(carry, _):
            env_state, value, ep_ret, key = carry
            key, k_act = jax.random.split(key)
            obs = env_state.obs
            mean, log_std = self._policy(ts.actor_params, ts.norm, obs)
            if deterministic:
                action = mean
            else:
                action = networks.gaussian_sample(k_act, mean, log_std)
            log_prob = networks.gaussian_logp(mean, log_std, action)

            stepped = self.env.step_batch(env_state, action)
            next_value = self._value(ts.critic_params, ts.norm, stepped.obs)

            terminated = stepped.done
            truncated = jnp.logical_and(stepped.steps >= cfg.max_traj_len, ~terminated)
            done = jnp.logical_or(terminated, truncated)

            reset_state = reset_pool.replace(key=stepped.key, iteration=stepped.iteration)
            next_state = _tree_where(done, reset_state, stepped)
            ep_ret = ep_ret + stepped.reward

            out = dict(
                obs=obs,
                action=action,
                log_prob=log_prob,
                value=value,
                next_value=next_value,
                reward=stepped.reward,
                terminated=terminated,
                done=done,
                ep_steps=stepped.steps,
                ep_return=jnp.where(done, ep_ret, 0.0),
            )
            ep_ret = jnp.where(done, 0.0, ep_ret)
            value_next = jnp.where(done, pool_values, next_value)
            return (next_state, value_next, ep_ret, key), out

        (env_state, _, _, key), traj = jax.lax.scan(
            step_fn,
            (ts.env_state, value0, jnp.zeros(cfg.num_envs), key),
            None,
            length=cfg.rollout_len,
        )
        return env_state, key, traj

    def _rollout_recurrent(self, ts: TrainState, key, deterministic: bool):
        """Recurrent rollout: actor/critic hidden states ride along and are
        zeroed at episode boundaries. Stores the rollout-start hidden states
        so the update can replay the sequence (BPTT over the rollout window,
        replacing the reference's padded-trajectory BPTT, ppo.py:512-539)."""
        cfg = self.cfg
        a_carry0, c_carry0 = ts.actor_carry, ts.critic_carry

        key, k_pool = jax.random.split(key)
        pool_keys = jax.random.split(k_pool, cfg.num_envs)
        reset_pool = self.env.reset_batch(pool_keys, jnp.broadcast_to(ts.iteration, (cfg.num_envs,)))
        # pool rotation: see _rollout — once per iteration, outside the scan
        reset_pool = jax.tree.map(lambda x: jnp.roll(x, ts.iteration, axis=0), reset_pool)

        def step_fn(carry, _):
            env_state, a_carry, c_carry, key = carry
            key, k_act = jax.random.split(key)
            obs = env_state.obs
            nobs = ts.norm.normalize(obs)
            a_carry2, (mean, log_std) = self.actor_def.apply(ts.actor_params, a_carry, nobs)
            if deterministic:
                action = mean
            else:
                action = networks.gaussian_sample(k_act, mean, log_std)
            log_prob = networks.gaussian_logp(mean, log_std, action)
            c_carry2, value = self.critic_def.apply(ts.critic_params, c_carry, nobs)

            stepped = self.env.step_batch(env_state, action)
            # bootstrap value of the next (pre-reset) obs with a throwaway carry
            _, next_value = self.critic_def.apply(
                ts.critic_params, c_carry2, ts.norm.normalize(stepped.obs)
            )

            terminated = stepped.done
            truncated = jnp.logical_and(stepped.steps >= cfg.max_traj_len, ~terminated)
            done = jnp.logical_or(terminated, truncated)

            reset_state = reset_pool.replace(key=stepped.key, iteration=stepped.iteration)
            next_state = _tree_where(done, reset_state, stepped)
            a_carry2 = self._mask_carry(a_carry2, done)
            c_carry2 = self._mask_carry(c_carry2, done)

            out = dict(
                obs=obs,
                action=action,
                log_prob=log_prob,
                value=value,
                next_value=next_value,
                reward=stepped.reward,
                terminated=terminated,
                done=done,
                ep_steps=stepped.steps,
            )
            return (next_state, a_carry2, c_carry2, key), out

        (env_state, a_carry, c_carry, key), traj = jax.lax.scan(
            step_fn, (ts.env_state, a_carry0, c_carry0, key), None, length=cfg.rollout_len
        )
        traj["actor_carry0"] = a_carry0
        traj["critic_carry0"] = c_carry0
        traj["final_carries"] = (a_carry, c_carry)
        return env_state, key, traj

    # ---------------------------------------------------------------- update

    def _loss_fn(self, actor_params, critic_params, norm, mb):
        cfg = self.cfg
        obs, actions, old_log_probs, advantages, returns = mb

        mean, log_std = self._policy(actor_params, norm, obs)
        log_probs = networks.gaussian_logp(mean, log_std, actions)
        ratio = jnp.exp(log_probs - old_log_probs)

        # clipped surrogate (ppo.py:310-320)
        surr1 = ratio * advantages
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip, 1.0 + cfg.clip) * advantages
        actor_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        clip_fraction = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip).astype(jnp.float32))

        values = self.critic_def.apply(critic_params, norm.normalize(obs))
        critic_loss = jnp.mean(jnp.square(returns - values))

        entropy = jnp.mean(networks.gaussian_entropy(log_std))

        # mirror symmetry loss (ppo.py:345-358)
        if self.obs_mirror is not None:
            mir_mean, _ = self._policy(actor_params, norm, obs @ self.obs_mirror.T)
            mirror_loss = jnp.mean(jnp.square(mean - mir_mean @ self.act_mirror.T))
        else:
            mirror_loss = jnp.zeros(())

        # imitation loss via frozen expert (ppo.py:361-368)
        if self.imitation_projector is not None:
            query = self.imitation_projector(obs)
            expert_mean = self.expert_apply(self.expert_params, query.expert_obs)
            imit_loss = imitation_loss(query, mean, expert_mean)
        else:
            imit_loss = jnp.zeros(())

        # approximate reverse KL for logging (ppo.py:370-376)
        log_ratio = log_probs - old_log_probs
        approx_kl = jnp.mean((ratio - 1.0) - log_ratio)

        total = (
            actor_loss
            + cfg.mirror_coeff * mirror_loss
            + cfg.imitate_coeff * imit_loss
            - cfg.entropy_coeff * entropy
            + critic_loss
        )
        aux = dict(
            actor_loss=actor_loss,
            critic_loss=critic_loss,
            entropy=entropy,
            mirror_loss=mirror_loss,
            imitation_loss=imit_loss,
            approx_kl=approx_kl,
            clip_fraction=clip_fraction,
        )
        return total, aux

    # ------------------------------------------------------ recurrent update

    def _replay_sequences(self, actor_params, critic_params, norm, obs, done_prev, a_c0, c_c0):
        """BPTT replay: run both nets over a (T, b, O) obs window, resetting
        hidden at episode boundaries. Returns (means, log_stds, values)."""

        def scan_fn(carry, xs):
            a_c, c_c = carry
            nob, dn = xs
            a_c = self._mask_carry(a_c, dn)
            c_c = self._mask_carry(c_c, dn)
            a_c, (mean, log_std) = self.actor_def.apply(actor_params, a_c, nob)
            c_c, value = self.critic_def.apply(critic_params, c_c, nob)
            return (a_c, c_c), (mean, log_std, value)

        nobs = norm.normalize(obs)
        _, (means, log_stds, values) = jax.lax.scan(scan_fn, (a_c0, c_c0), (nobs, done_prev))
        return means, log_stds, values

    def _loss_recurrent(self, actor_params, critic_params, norm, mb):
        cfg = self.cfg
        obs, actions, old_log_probs, advantages, returns, done, a_c0, c_c0 = mb
        done_prev = jnp.concatenate([jnp.zeros_like(done[:1]), done[:-1]], axis=0)
        means, log_stds, values = self._replay_sequences(
            actor_params, critic_params, norm, obs, done_prev, a_c0, c_c0
        )
        log_probs = networks.gaussian_logp(means, log_stds, actions)
        ratio = jnp.exp(log_probs - old_log_probs)
        surr1 = ratio * advantages
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip, 1.0 + cfg.clip) * advantages
        actor_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        clip_fraction = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip).astype(jnp.float32))
        critic_loss = jnp.mean(jnp.square(returns - values))
        entropy = jnp.mean(networks.gaussian_entropy(log_stds))

        if self.obs_mirror is not None:
            zero_a = jax.tree.map(jnp.zeros_like, a_c0)
            zero_c = jax.tree.map(jnp.zeros_like, c_c0)
            mir_means, _, _ = self._replay_sequences(
                actor_params, critic_params, norm, obs @ self.obs_mirror.T, done_prev, zero_a, zero_c
            )
            mirror_loss = jnp.mean(jnp.square(means - mir_means @ self.act_mirror.T))
        else:
            mirror_loss = jnp.zeros(())

        if self.imitation_projector is not None:
            flat_obs = obs.reshape(-1, obs.shape[-1])
            query = self.imitation_projector(flat_obs)
            expert_mean = self.expert_apply(self.expert_params, query.expert_obs)
            imit_loss = imitation_loss(query, means.reshape(-1, means.shape[-1]), expert_mean)
        else:
            imit_loss = jnp.zeros(())

        log_ratio = log_probs - old_log_probs
        approx_kl = jnp.mean((ratio - 1.0) - log_ratio)
        total = (
            actor_loss
            + cfg.mirror_coeff * mirror_loss
            + cfg.imitate_coeff * imit_loss
            - cfg.entropy_coeff * entropy
            + critic_loss
        )
        aux = dict(
            actor_loss=actor_loss,
            critic_loss=critic_loss,
            entropy=entropy,
            mirror_loss=mirror_loss,
            imitation_loss=imit_loss,
            approx_kl=approx_kl,
            clip_fraction=clip_fraction,
        )
        return total, aux

    def _update_recurrent(self, ts: TrainState, batch: Batch, key):
        """Minibatches are subsets of env sequences; BPTT over the rollout
        window with hidden resets at episode boundaries (replaces the
        reference's pad_sequence trajectory batching, ppo.py:512-539)."""
        cfg = self.cfg
        n_envs = cfg.num_envs
        seq_mb = max(min(cfg.minibatch_size // cfg.rollout_len, n_envs), 1)
        n_mb = max(n_envs // seq_mb, 1)

        use_slices = self.cfg.minibatch_scheme == "slice"

        def epoch_fn(carry, key_epoch):
            actor_params, critic_params, actor_opt, critic_opt = carry
            if use_slices:
                # random ORDER over contiguous env ranges (envs are i.i.d. so
                # a fixed contiguous grouping is an unbiased minibatch): the
                # per-minibatch env gathers dominate the update's device time
                perm = jax.random.permutation(key_epoch, n_mb) * seq_mb
            else:
                perm = jax.random.permutation(key_epoch, n_envs)[: n_mb * seq_mb].reshape(n_mb, seq_mb)

            def mb_fn(carry, idx):
                actor_params, critic_params, actor_opt, critic_opt = carry
                if use_slices:
                    take_t = lambda x: jax.lax.dynamic_slice_in_dim(x, idx, seq_mb, axis=1)
                    take_c = lambda x: jax.lax.dynamic_slice_in_dim(x, idx, seq_mb, axis=0)
                else:
                    take_t = lambda x: x[:, idx]
                    take_c = lambda x: x[idx]
                mb = (
                    take_t(batch.obs),
                    take_t(batch.actions),
                    take_t(batch.log_probs),
                    take_t(batch.advantages),
                    take_t(batch.returns),
                    take_t(batch.done),
                    jax.tree.map(take_c, batch.actor_carry0),
                    jax.tree.map(take_c, batch.critic_carry0),
                )
                grad_fn = jax.value_and_grad(self._loss_recurrent, argnums=(0, 1), has_aux=True)
                (loss, aux), (a_grad, c_grad) = grad_fn(actor_params, critic_params, ts.norm, mb)
                a_updates, actor_opt = self.actor_tx.update(a_grad, actor_opt, actor_params)
                actor_params = optax.apply_updates(actor_params, a_updates)
                c_updates, critic_opt = self.critic_tx.update(c_grad, critic_opt, critic_params)
                critic_params = optax.apply_updates(critic_params, c_updates)
                return (actor_params, critic_params, actor_opt, critic_opt), aux

            carry, auxes = jax.lax.scan(mb_fn, carry, perm)
            return carry, jax.tree.map(jnp.mean, auxes)

        keys = jax.random.split(key, cfg.epochs)
        carry = (ts.actor_params, ts.critic_params, ts.actor_opt, ts.critic_opt)
        (actor_params, critic_params, actor_opt, critic_opt), auxes = jax.lax.scan(epoch_fn, carry, keys)
        aux = jax.tree.map(jnp.mean, auxes)
        return (
            ts.replace(
                actor_params=actor_params,
                critic_params=critic_params,
                actor_opt=actor_opt,
                critic_opt=critic_opt,
            ),
            aux,
        )

    def _update(self, ts: TrainState, batch: Batch, key):
        if self.cfg.recurrent:
            return self._update_recurrent(ts, batch, key)
        cfg = self.cfg
        n = cfg.batch_size
        mb_size = min(cfg.minibatch_size, n)
        n_mb = max(n // mb_size, 1)

        flat = jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), batch)
        use_slices = self.cfg.minibatch_scheme == "slice"

        def epoch_fn(carry, key_epoch):
            actor_params, critic_params, actor_opt, critic_opt = carry
            if use_slices:
                # random ORDER over fixed contiguous chunks: zero gathers
                perm = jax.random.permutation(key_epoch, n_mb) * mb_size
            else:
                perm = jax.random.permutation(key_epoch, n)[: n_mb * mb_size].reshape(n_mb, mb_size)

            def mb_fn(carry, idx):
                actor_params, critic_params, actor_opt, critic_opt = carry
                if use_slices:
                    take = lambda x: jax.lax.dynamic_slice_in_dim(x, idx, mb_size)
                else:
                    take = lambda x: x[idx]
                mb = (
                    take(flat.obs),
                    take(flat.actions),
                    take(flat.log_probs),
                    take(flat.advantages),
                    take(flat.returns),
                )
                grad_fn = jax.value_and_grad(self._loss_fn, argnums=(0, 1), has_aux=True)
                (loss, aux), (a_grad, c_grad) = grad_fn(actor_params, critic_params, ts.norm, mb)
                a_updates, actor_opt = self.actor_tx.update(a_grad, actor_opt, actor_params)
                actor_params = optax.apply_updates(actor_params, a_updates)
                c_updates, critic_opt = self.critic_tx.update(c_grad, critic_opt, critic_params)
                critic_params = optax.apply_updates(critic_params, c_updates)
                return (actor_params, critic_params, actor_opt, critic_opt), aux

            carry, auxes = jax.lax.scan(mb_fn, carry, perm)
            return carry, jax.tree.map(jnp.mean, auxes)

        keys = jax.random.split(key, cfg.epochs)
        carry = (ts.actor_params, ts.critic_params, ts.actor_opt, ts.critic_opt)
        (actor_params, critic_params, actor_opt, critic_opt), auxes = jax.lax.scan(
            epoch_fn, carry, keys
        )
        aux = jax.tree.map(jnp.mean, auxes)
        return (
            ts.replace(
                actor_params=actor_params,
                critic_params=critic_params,
                actor_opt=actor_opt,
                critic_opt=critic_opt,
            ),
            aux,
        )

    # ------------------------------------------------------------- iteration

    def _train_iter(self, ts: TrainState):
        """One full PPO iteration: jitted sample segment + jitted optimize
        segment (kept separate so their wall times can be measured; the
        intermediate batch stays on device)."""
        ts, batch, k_upd, roll_metrics = self._sample_iter(ts)
        ts, aux = self._optimize_iter(ts, batch, k_upd)
        return ts, {**roll_metrics, **aux}

    def _sample_iteration(self, ts: TrainState):
        key, k_roll, k_upd = jax.random.split(ts.key, 3)
        env_state, _, traj = self._rollout(ts, k_roll, deterministic=False)

        advantages, returns = compute_gae(
            traj["reward"],
            traj["value"],
            traj["next_value"],
            traj["terminated"],
            traj["done"],
            self.cfg.gamma,
            self.cfg.lam,
        )
        # normalize advantages over the whole batch (ppo.py:484-485)
        advantages = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-5)

        batch = Batch(
            obs=traj["obs"],
            actions=traj["action"],
            log_probs=traj["log_prob"],
            advantages=advantages,
            returns=returns,
            done=traj["done"] if self.cfg.recurrent else None,
            actor_carry0=traj.get("actor_carry0"),
            critic_carry0=traj.get("critic_carry0"),
        )
        ts = ts.replace(env_state=env_state, key=key, iteration=ts.iteration + 1)
        if self.cfg.recurrent:
            a_carry, c_carry = traj["final_carries"]
            ts = ts.replace(actor_carry=a_carry, critic_carry=c_carry)
        # advance the per-env curriculum counter by deriving from the existing
        # (data-sharded) leaf rather than broadcasting the scalar — keeps the
        # env batch's mesh sharding stable across iterations
        ts = ts.replace(env_state=ts.env_state.replace(iteration=ts.env_state.iteration + 1))

        done_f = traj["done"].astype(jnp.float32)
        n_done = jnp.sum(done_f)
        ep_return = traj.get("ep_return")
        ep_reward = (
            jnp.sum(ep_return) / jnp.maximum(n_done, 1.0)
            if ep_return is not None
            else jnp.sum(traj["reward"]) / jnp.maximum(n_done, 1.0)
        )
        roll_metrics = dict(
            mean_reward=jnp.mean(traj["reward"]),
            mean_episode_length=jnp.sum(done_f * traj["ep_steps"]) / jnp.maximum(n_done, 1.0),
            episodes_finished=n_done,
            episode_reward=ep_reward,
        )
        return ts, batch, k_upd, roll_metrics

    def _optimize_iteration(self, ts: TrainState, batch: Batch, k_upd):
        ts, aux = self._update(ts, batch, k_upd)
        metrics = dict(aux)
        if self.cfg.recurrent:
            carry1 = networks.LSTMCore.initial_carry(self.hidden_sizes, (1,))
            _, (_, log_std) = self.actor_def.apply(
                ts.actor_params, carry1, ts.norm.normalize(batch.obs[0, :1])
            )
        else:
            _, log_std = self._policy(ts.actor_params, ts.norm, batch.obs[0, :1])
        metrics["mean_noise_std"] = jnp.mean(jnp.exp(log_std))
        return ts, metrics

    def _warmup_iteration(self, ts: TrainState):
        """Obs-norm warmup: rollout + Welford update, no learning."""
        key, k_roll = jax.random.split(ts.key)
        env_state, _, traj = self._rollout(ts, k_roll, deterministic=False)
        norm = update_norm(ts.norm, traj["obs"])
        return ts.replace(env_state=env_state, key=key, norm=norm)

    def _eval_rollout(self, ts: TrainState, key):
        """Deterministic evaluation from fresh resets (reference evaluate(),
        ppo.py:408-426: deterministic batches -> mean episode reward)."""
        cfg = self.cfg
        k_env, k_roll, k_pool = jax.random.split(key, 3)
        env_keys = jax.random.split(k_env, cfg.num_envs)
        env_state = self.env.reset_batch(env_keys, jnp.broadcast_to(ts.iteration, (cfg.num_envs,)))
        pool_keys = jax.random.split(k_pool, cfg.num_envs)
        reset_pool = self.env.reset_batch(pool_keys, jnp.broadcast_to(ts.iteration, (cfg.num_envs,)))

        def step_fn(carry, _):
            env_state, a_carry, ep_ret, ep_len, ret_acc, len_acc, cnt = carry
            if cfg.recurrent:
                a_carry, (mean, _) = self.actor_def.apply(
                    ts.actor_params, a_carry, ts.norm.normalize(env_state.obs)
                )
            else:
                mean, _ = self._policy(ts.actor_params, ts.norm, env_state.obs)
            stepped = self.env.step_batch(env_state, mean)
            terminated = stepped.done
            truncated = jnp.logical_and(stepped.steps >= cfg.max_traj_len, ~terminated)
            done = jnp.logical_or(terminated, truncated)
            ep_ret = ep_ret + stepped.reward
            ep_len = ep_len + 1.0
            ret_acc = ret_acc + jnp.sum(jnp.where(done, ep_ret, 0.0))
            len_acc = len_acc + jnp.sum(jnp.where(done, ep_len, 0.0))
            cnt = cnt + jnp.sum(done.astype(jnp.float32))
            ep_ret = jnp.where(done, 0.0, ep_ret)
            ep_len = jnp.where(done, 0.0, ep_len)
            reset_state = reset_pool.replace(key=stepped.key, iteration=stepped.iteration)
            env_state = _tree_where(done, reset_state, stepped)
            if cfg.recurrent:
                a_carry = self._mask_carry(a_carry, done)
            return (env_state, a_carry, ep_ret, ep_len, ret_acc, len_acc, cnt), None

        zeros = jnp.zeros((cfg.num_envs,))
        if cfg.recurrent:
            carry0 = networks.LSTMCore.initial_carry(self.hidden_sizes, (cfg.num_envs,))
        else:
            carry0 = ()
        (env_state, _, ep_ret, ep_len, ret_acc, len_acc, cnt), _ = jax.lax.scan(
            step_fn,
            (env_state, carry0, zeros, zeros, jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
            None,
            length=cfg.max_traj_len,
        )
        # include unfinished episodes (ran the full horizon)
        ret_acc = ret_acc + jnp.sum(ep_ret)
        len_acc = len_acc + jnp.sum(ep_len)
        cnt = cnt + jnp.sum((ep_len > 0).astype(jnp.float32))
        return dict(eval_mean_reward=ret_acc / jnp.maximum(cnt, 1.0), eval_mean_episode_length=len_acc / jnp.maximum(cnt, 1.0))

    # ----------------------------------------------------------------- train

    def train(
        self,
        n_itr: int | None = None,
        seed: int | None = None,
        logger=None,
        checkpointer=None,
        init_ts: TrainState | None = None,
        verbose: bool = True,
        profile_dir: str | None = None,
    ) -> TrainState:
        cfg = self.cfg
        n_itr = n_itr if n_itr is not None else cfg.n_itr
        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        ts = init_ts if init_ts is not None else self.init_state(key)

        # observation-normalization warmup (running-norm envs only)
        if self.env.obs_mean is None:
            for _ in range(cfg.input_norm_iters):
                ts = self._warmup_iter(ts)

        start = time.time()
        best_eval = -np.inf
        tracing = False
        for itr in range(n_itr):
            # optional profiler capture of post-compile iterations 2-4
            # (SURVEY §5 tracing; view with tensorboard/xprof)
            if profile_dir is not None and itr == 2:
                jax.profiler.start_trace(str(profile_dir))
                tracing = True
            if profile_dir is not None and itr == 5:
                jax.profiler.stop_trace()
                tracing = False
                if verbose:
                    print(f"profiler trace (iterations 2-4) written to {profile_dir}", flush=True)
            t0 = time.time()
            ts, batch, k_upd, roll_metrics = self._sample_iter(ts)
            # force a fetch: block_until_ready is unreliable on the axon
            # runtime, but a scalar device->host read is a real sync point
            roll_metrics = {k: float(v) for k, v in roll_metrics.items()}
            t1 = time.time()
            ts, aux = self._optimize_iter(ts, batch, k_upd)
            aux = {k: float(v) for k, v in aux.items()}
            t2 = time.time()
            metrics = {**roll_metrics, **aux}
            sample_time, optimize_time = t1 - t0, t2 - t1
            iter_time = t2 - t0
            fps = cfg.batch_size / max(iter_time, 1e-9)

            if verbose:
                print(
                    f"itr {itr:5d} | reward/step {metrics['mean_reward']:.3f} | "
                    f"ep_len {metrics['mean_episode_length']:.1f} | "
                    f"actor {metrics['actor_loss']:.4f} | critic {metrics['critic_loss']:.4f} | "
                    f"kl {metrics['approx_kl']:.4f} | fps {fps:,.0f}",
                    flush=True,
                )
            if logger is not None:
                logger.log_training(itr, metrics)
                logger.log_timing(itr, fps=fps, sample_time=sample_time, optimize_time=optimize_time, total_elapsed=time.time() - start)

            if (itr % cfg.eval_freq == 0) or (itr == n_itr - 1):
                ts2, k_eval = ts, jax.random.fold_in(ts.key, itr)
                eval_metrics = {k: float(v) for k, v in self._eval_iter(ts2, k_eval).items()}
                if verbose:
                    print(
                        f"  eval @ {itr}: reward {eval_metrics['eval_mean_reward']:.2f} "
                        f"len {eval_metrics['eval_mean_episode_length']:.1f}",
                        flush=True,
                    )
                if logger is not None:
                    logger.log_eval(itr, eval_metrics)
                if checkpointer is not None:
                    is_best = eval_metrics["eval_mean_reward"] > best_eval
                    best_eval = max(best_eval, eval_metrics["eval_mean_reward"])
                    checkpointer.save(itr, ts, metrics=eval_metrics, is_best=is_best)
        if tracing:  # n_itr ended before the stop iteration
            jax.profiler.stop_trace()
        return ts
