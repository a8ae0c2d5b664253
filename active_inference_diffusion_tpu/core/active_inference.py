"""Diffusion active inference core: belief generation, ELBO, EFE.

TPU-native counterpart of the reference's ``DiffusionActiveInference``
(reference: active_inference_diffusion/core/active_inference.py:19-771), built
as a *stateless orchestrator*: module definitions + static config live on the
object, every method is a pure function of an explicit parameter pytree and
PRNG keys, so everything composes with jit/grad/vmap/pjit.

Major structural differences (design, not translation):

- Belief generation is one ``lax.scan`` sweep (core/diffusion.py here), not a
  Python loop of K kernel launches.
- The EFE imagination rollout folds (num_trajectories x batch) into one batch
  axis and scans over the horizon (the reference runs 10 x 5 sequential Python
  iterations, reference :337-380).
- Gradient partitioning is expressed by taking ``jax.grad`` w.r.t. explicit
  parameter groups instead of optimizer ``zero_grad`` choreography.
- Sign/weighting quirks of the reference are gated by ``SemanticsConfig``
  (see DEVIATIONS.md): the reference's published loss *maximizes* the
  score-matching term (reference :620-636 returns -elbo with score matching
  entering the elbo positively), never trains decoder/reward predictor, and
  *minimizes* expected reward in the EFE (:353-375).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import ActiveInferenceConfig
from ..models.decoders import (
    ContinuationPredictor,
    FeatureDecoder,
    RewardPredictor,
    StateDecoder,
    reward_log_prob,
)
from ..models.dynamics import LatentDynamicsModel
from ..models.encoders import ConvDecoder, LatentPosteriorEncoder
from ..models.policy import DiffusionConditionedPolicy, PolicyDist, sample_action
from ..models.score_network import LatentScoreNetwork
from ..models.value import ValueNetwork
from . import diffusion as dproc
from .belief_dynamics import FPConfig, fp_refine_mean
from .epistemic import FunctionSpaceEpistemicEstimator, estimate_epistemic_value
from .returns import compute_lambda_returns
from .schedules import DiffusionSchedule, schedule_from_config
from .time_sampler import importance_sample_time

Params = Dict[str, Any]


class BeliefInfo(NamedTuple):
    latent: jnp.ndarray  # (B, D)
    latent_mean: jnp.ndarray  # (D,)
    latent_std: jnp.ndarray  # (D,)
    reconstruction_error: jnp.ndarray  # scalar
    trajectory: Optional[jnp.ndarray]  # (K+1, B, D) when requested


class DiffusionActiveInference:
    """Static model container; all methods are pure functions of params."""

    def __init__(
        self,
        observation_dim: int,
        action_dim: int,
        latent_dim: int,
        config: ActiveInferenceConfig,
        pixel_shape: Optional[Tuple[int, int, int]] = None,
    ):
        self.observation_dim = observation_dim
        self.action_dim = action_dim
        self.latent_dim = latent_dim
        self.config = config
        self.pixel_shape = pixel_shape  # (C, H, W) like the reference
        self.is_pixel = config.pixel_observation

        if config.act_from_posterior and not config.posterior_beliefs:
            raise ValueError(
                "act_from_posterior requires posterior_beliefs: without it the "
                "posterior encoder receives no gradients and acting would use "
                "a frozen random-init head (silent train/act mismatch)."
            )
        if config.posterior_beliefs and config.ground_beliefs:
            raise ValueError(
                "posterior_beliefs and ground_beliefs are mutually exclusive "
                "belief sources for the training latents (see DEVIATIONS.md); "
                "set exactly one."
            )
        if config.auto_entropy and not config.imagined_value_targets:
            raise ValueError(
                "auto_entropy tunes the imagined actor's entropy coefficient "
                "and is silently inert without imagined_value_targets; enable "
                "both (the EFE policy path uses consistency_weight instead)."
            )

        self.schedule: DiffusionSchedule = schedule_from_config(config.diffusion)

        # --- module definitions (reference _build_models, :59-171) ---
        self.score_network = LatentScoreNetwork(
            latent_dim=latent_dim,
            observation_dim=latent_dim if self.is_pixel else observation_dim,
            hidden_dim=config.hidden_dim,
            num_layers=config.score_num_layers,
            use_attention=True,
        )
        # Squash resolution: explicit flag wins; otherwise corrected mode
        # squashes (bounded actions are required when reward is actually
        # maximized) and faithful mode matches the reference's unsquashed
        # default (policy_networks.py:30).
        self.policy_squash = (
            config.policy_squash
            if config.policy_squash is not None
            else config.semantics.mode == "corrected"
        )
        self.policy_network = DiffusionConditionedPolicy(
            latent_dim=latent_dim,
            action_dim=action_dim,
            hidden_dim=config.hidden_dim,
            use_state_dependent_std=True,
            squash_output=self.policy_squash,
        )
        self.value_network = ValueNetwork(
            state_dim=latent_dim,
            hidden_dim=config.hidden_dim,
            time_embed_dim=128,
            num_layers=3,
        )
        self.latent_dynamics = LatentDynamicsModel(
            state_dim=latent_dim,
            action_dim=action_dim,
            hidden_dim=config.hidden_dim,
            num_layers=3,
        )
        if self.is_pixel:
            assert pixel_shape is not None
            self.observation_decoder = ConvDecoder(
                latent_dim=latent_dim,
                img_channels=pixel_shape[0],
                hidden_dim=config.hidden_dim,
                # two sub-pixel 2x upsamples: 84 -> spatial 21 (reference
                # hardcodes 21 for 84x84, core/active_inference.py:134-140)
                spatial_size=pixel_shape[1] // 4,
                use_spectral_norm=config.use_spectral_norm,
            )
            self.feature_decoder = FeatureDecoder(
                latent_dim=latent_dim, hidden_dim=config.hidden_dim
            )
        else:
            self.observation_decoder = StateDecoder(
                observation_dim=observation_dim, hidden_dim=config.hidden_dim
            )
            self.feature_decoder = None
        self.reward_predictor = RewardPredictor(hidden_dim=config.hidden_dim)
        self.continuation_predictor = ContinuationPredictor(
            hidden_dim=config.hidden_dim
        )
        # Amortized posterior q(z|o) (extension, no reference counterpart):
        # grounds the score-matching target when cfg.posterior_beliefs is set
        # (see DEVIATIONS.md). Input is the same conditioning the score net
        # sees (raw state / encoded pixel features).
        self.posterior_encoder = LatentPosteriorEncoder(
            latent_dim=latent_dim, hidden_dim=config.hidden_dim
        )
        self._fused_sweep_checked: Optional[bool] = None
        self.epistemic_estimator = FunctionSpaceEpistemicEstimator(
            latent_dim=latent_dim,
            is_pixel=self.is_pixel,
            ntk_samples=4,
            spatial_aggregator_output_dim=config.spatial_aggregator_output_dim,
        )

    def _use_fused_sweep(self) -> bool:
        """Whether the Pallas fused K-step denoiser applies (flag + VMEM
        budget + TPU backend)."""
        if self._fused_sweep_checked is None:
            ok = False
            if self.config.tpu.use_pallas_denoiser:
                from ..ops.denoise import fused_sweep_supported

                try:
                    backend_is_tpu = jax.default_backend() == "tpu"
                except RuntimeError:
                    backend_is_tpu = False
                ok = backend_is_tpu and fused_sweep_supported(
                    self.config.hidden_dim,
                    self.latent_dim,
                    self.config.score_num_layers,
                    bytes_per_param=(
                        2 if self.config.tpu.compute_dtype == "bfloat16" else 4
                    ),
                )
            self._fused_sweep_checked = ok
        return self._fused_sweep_checked

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        """Initialize all parameter groups. Group boundaries mirror the
        reference's optimizer partitions (agents/state_agent.py:245-274)."""
        keys = jax.random.split(key, 9)
        obs_dim = self.latent_dim if self.is_pixel else self.observation_dim
        dummy_obs = jnp.zeros((1, obs_dim))
        dummy_z = jnp.zeros((1, self.latent_dim))
        dummy_t = jnp.zeros((1,))
        dummy_a = jnp.zeros((1, self.action_dim))

        score = self.score_network.init(
            keys[0], dummy_z, dummy_t, dummy_obs, continuous=True, train=False
        )["params"]
        diffusion = dproc.init_diffusion_params(self.latent_dim)
        policy = self.policy_network.init(keys[1], dummy_z)["params"]
        value = self.value_network.init(keys[2], dummy_z, dummy_t)["params"]
        if self.config.num_dynamics_ensemble > 1:
            # K independently-initialized members, stacked on a leading axis
            # (one pytree, vmapped apply; see predict_next_latent_members).
            dyn_keys = jax.random.split(keys[3], self.config.num_dynamics_ensemble)
            dynamics = jax.vmap(
                lambda k: self.latent_dynamics.init(k, dummy_z, dummy_a)["params"]
            )(dyn_keys)
        else:
            dynamics = self.latent_dynamics.init(keys[3], dummy_z, dummy_a)["params"]
        decoder = self.observation_decoder.init(keys[4], dummy_z, train=False)["params"]
        reward = self.reward_predictor.init(keys[5], dummy_z)["params"]
        continuation = self.continuation_predictor.init(
            jax.random.fold_in(keys[5], 1), dummy_z
        )["params"]

        # Epistemic estimator init needs probe shapes
        obs_event_shape = (
            tuple(np.roll(self.pixel_shape, -1)) if self.is_pixel else (self.observation_dim,)
        )
        ntk = self.epistemic_estimator.ntk_samples
        dummy_probes = jnp.zeros((ntk, 2) + obs_event_shape)
        dummy_perm = jnp.arange(2)
        epistemic = self.epistemic_estimator.init(
            keys[6], dummy_probes, jnp.zeros((2, self.latent_dim)), dummy_perm, train=False
        )

        posterior = self.posterior_encoder.init(keys[8], dummy_obs)["params"]

        params: Params = {
            "score": score,
            "diffusion": diffusion,
            "policy": policy,
            "value": value,
            "dynamics": dynamics,
            "decoder": decoder,
            "reward": reward,
            "continuation": continuation,
            "posterior": posterior,
            "epistemic": epistemic,  # full variables dict ({'params': ...})
        }
        if self.is_pixel:
            params["feature_decoder"] = self.feature_decoder.init(
                keys[7], dummy_z, train=False
            )["params"]
        return params

    # ------------------------------------------------------------------
    # Model applications
    # ------------------------------------------------------------------

    def apply_score(
        self,
        score_params,
        z: jnp.ndarray,
        t: jnp.ndarray,
        observation: Optional[jnp.ndarray],
        continuous: bool,
        train: bool = False,
        dropout_key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        rngs = {"dropout": dropout_key} if (train and dropout_key is not None) else {}
        return self.score_network.apply(
            {"params": score_params}, z, t, observation,
            continuous=continuous, train=train, rngs=rngs,
        )

    def apply_policy(self, policy_params, z: jnp.ndarray) -> PolicyDist:
        return self.policy_network.apply({"params": policy_params}, z)

    def apply_value(self, value_params, z: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return self.value_network.apply({"params": value_params}, z, t)[..., 0]

    def predict_next_latent_members(
        self, dynamics_params, latent: jnp.ndarray, action: jnp.ndarray
    ) -> jnp.ndarray:
        """(K, B, D) next-latent means over all ensemble members (K = 1
        returns the single net's prediction with a leading axis)."""
        if self.config.num_dynamics_ensemble > 1:
            return jax.vmap(
                lambda p: self.latent_dynamics.apply({"params": p}, latent, action)
            )(dynamics_params)
        return self.latent_dynamics.apply(
            {"params": dynamics_params}, latent, action
        )[None]

    def predict_next_latent(
        self, dynamics_params, latent: jnp.ndarray, action: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Residual dynamics with fixed logvar (reference :453-464; the
        reference hardcodes log(0.1) — ``cfg.dynamics_logvar`` makes the
        noise scale a knob, since it is an arbitrary constant, not learned).
        With an ensemble this is the member MEAN (used by the epistemic
        probes and contrastive prediction; imagination samples members via
        ``imagine_next`` instead)."""
        if self.config.num_dynamics_ensemble > 1:
            next_mean = jnp.mean(
                self.predict_next_latent_members(dynamics_params, latent, action),
                axis=0,
            )
        else:
            next_mean = self.latent_dynamics.apply(
                {"params": dynamics_params}, latent, action
            )
        next_logvar = jnp.full_like(next_mean, self.config.dynamics_logvar)
        return next_mean, next_logvar

    def imagine_next(
        self,
        dynamics_params,
        latent: jnp.ndarray,
        action: jnp.ndarray,
        key: jax.Array,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One imagination step: next latent plus per-sample model
        disagreement.

        Ensemble (K > 1): a random member per SAMPLE per step (TS1-style
        trajectory sampling, MBPO arXiv:1906.08253) predicts the mean;
        disagreement is mean over dims of the member std. Single net:
        the plain prediction, disagreement 0. The fixed-variance noise
        (``imagine_deterministic`` / ``dynamics_logvar``) is applied by the
        caller, which owns the noise key."""
        member_key = jax.random.fold_in(key, 1)
        means = self.predict_next_latent_members(dynamics_params, latent, action)
        k = means.shape[0]
        if k > 1:
            idx = jax.random.randint(member_key, (latent.shape[0],), 0, k)
            next_mean = means[idx, jnp.arange(latent.shape[0])]
            disagreement = jnp.mean(jnp.std(means, axis=0), axis=-1)
        else:
            next_mean = means[0]
            disagreement = jnp.zeros((latent.shape[0],), latent.dtype)
        next_logvar = jnp.full_like(next_mean, self.config.dynamics_logvar)
        return next_mean, next_logvar, disagreement

    def _guard_imagined_reward(
        self,
        reward_mean: jnp.ndarray,
        reward_std: jnp.ndarray,
        disagreement: jnp.ndarray,
    ) -> jnp.ndarray:
        """Apply the configured imagination guards to a predicted reward:
        NLL-sigma pessimism, ensemble-disagreement pessimism, hard clip
        (in that order; the clip bounds whatever hallucination survives)."""
        cfg = self.config
        if cfg.imagined_reward_pessimism > 0.0:
            reward_mean = reward_mean - cfg.imagined_reward_pessimism * reward_std
        if cfg.ensemble_pessimism > 0.0:
            reward_mean = reward_mean - cfg.ensemble_pessimism * disagreement
        if cfg.imagined_reward_clip > 0.0:
            reward_mean = jnp.clip(
                reward_mean, -cfg.imagined_reward_clip, cfg.imagined_reward_clip
            )
        return reward_mean

    def predict_reward(self, reward_params, latent: jnp.ndarray):
        return self.reward_predictor.apply({"params": reward_params}, latent)

    def predict_continuation(self, continuation_params, latent: jnp.ndarray):
        """Continuation logit c(z); sigmoid gives P(episode continues)."""
        return self.continuation_predictor.apply(
            {"params": continuation_params}, latent
        )

    def apply_posterior(
        self, posterior_params, observation: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Amortized posterior q(z|o) -> (mu, logstd). `observation` is the
        score-net conditioning (raw state / encoded pixel features)."""
        return self.posterior_encoder.apply({"params": posterior_params}, observation)

    def sample_posterior(
        self,
        posterior_params,
        key: Optional[jax.Array],
        observation: jnp.ndarray,
        deterministic: bool = False,
    ) -> jnp.ndarray:
        """Reparameterized draw z = mu + sigma*eps (mu when deterministic)."""
        mu, logstd = self.apply_posterior(posterior_params, observation)
        if deterministic or key is None:
            return mu
        eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
        return mu + eps * jnp.exp(logstd)

    def decode_observation(
        self,
        params: Params,
        latent: jnp.ndarray,
        decode_to_pixels: bool = True,
        train: bool = False,
        dropout_key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Decode latent to observation space (reference :217-242)."""
        rngs = {"dropout": dropout_key} if (train and dropout_key is not None) else {}
        if self.is_pixel:
            if decode_to_pixels:
                return self.observation_decoder.apply(
                    {"params": params["decoder"]}, latent, train=train, rngs=rngs
                )
            return self.feature_decoder.apply(
                {"params": params["feature_decoder"]}, latent, train=train, rngs=rngs
            )
        return self.observation_decoder.apply(
            {"params": params["decoder"]}, latent, train=train, rngs=rngs
        )

    # ------------------------------------------------------------------
    # Belief generation via reverse diffusion (reference :256-312)
    # ------------------------------------------------------------------

    def generate_beliefs(
        self,
        params: Params,
        key: jax.Array,
        observation: jnp.ndarray,
        num_steps: Optional[int] = None,
        deterministic: bool = False,
        return_trajectory: bool = False,
        compute_reconstruction: bool = True,
        z_init: Optional[jnp.ndarray] = None,
    ) -> BeliefInfo:
        """Run the reverse-diffusion sweep conditioned on observations and
        return the final latent belief plus diagnostics.

        TPU-first structure: the observation embedding is computed ONCE and
        all K time embeddings are computed in one batched shot; the scan body
        runs only the per-step trunk + p_sample (the reference — and a naive
        port — recomputes the full obs encoder inside every denoising step,
        reference core/diffusion.py:196-205).

        ``z_init``: warm-start partial denoising — instead of starting from
        pure noise, forward-noise ``z_init`` (e.g. the previous control step's
        belief) to the truncation timestep with ``q_sample`` and denoise from
        there. With a truncated ``num_steps`` this is the partial-denoising
        recipe of Falcon (arXiv:2503.00339) applied to belief propagation:
        consecutive observations are similar, so few reverse steps suffice.
        For ``z_init ~ N(0, I)`` the warm start is *exactly* a standard-normal
        start (q_sample preserves it), so episode resets can simply pass
        fresh Gaussian latents."""
        batch_size = observation.shape[0]
        dtype = observation.dtype
        k = self.schedule.num_steps if num_steps is None else num_steps
        if k > self.schedule.num_steps:
            raise ValueError(
                f"num_steps={k} exceeds schedule length {self.schedule.num_steps}"
            )

        variables = {"params": params["score"]}
        obs_emb = self.score_network.apply(
            variables, observation, method="obs_embedding"
        )
        timesteps = jnp.arange(k - 1, -1, -1, dtype=jnp.int32)
        t_embs = self.score_network.apply(
            variables, timesteps.astype(dtype), continuous=False,
            method="time_embedding",
        )  # (K, hidden)

        init_key, scan_key = jax.random.split(key)
        if z_init is None:
            z_init = jax.random.normal(
                init_key, (batch_size, self.latent_dim), dtype=dtype
            )
        else:
            # Forward-noise the warm start to the truncation timestep.
            t0 = jnp.full((batch_size,), k - 1, dtype=jnp.int32)
            fwd_noise = jax.random.normal(init_key, z_init.shape, dtype=dtype)
            z_init = dproc.q_sample(self.schedule, z_init, t0, fwd_noise)

        if self._use_fused_sweep() and not return_trajectory:
            from ..ops.denoise import (
                fused_denoise_sweep,
                fused_denoise_sweep_v2,
            )

            sweep_fn = (
                fused_denoise_sweep_v2
                if self.config.tpu.denoiser_kernel == "v2"
                else fused_denoise_sweep
            )
            seed = jax.random.randint(scan_key, (), 0, jnp.iinfo(jnp.int32).max)
            latent = sweep_fn(
                self.schedule, params["score"], z_init, obs_emb, t_embs,
                seed=seed, num_steps=k, num_layers=self.config.score_num_layers,
                deterministic=deterministic,
                compute_dtype=(
                    jnp.bfloat16
                    if self.config.tpu.compute_dtype == "bfloat16"
                    else jnp.float32
                ),
            )
            trajectory = None
        else:
            step_keys = jax.random.split(scan_key, k)

            def body(z, inputs):
                t_scalar, t_emb, step_key = inputs
                conditioning = obs_emb + t_emb[None, :]
                score = self.score_network.apply(
                    variables, z, conditioning, None, method="trunk"
                )
                t_batch = jnp.full((batch_size,), t_scalar, dtype=jnp.int32)
                noise = jax.random.normal(step_key, z.shape, dtype=dtype)
                z_next = dproc.p_sample(
                    self.schedule, z, t_batch, score, noise,
                    deterministic=deterministic,
                )
                return z_next, (z_next if return_trajectory else None)

            latent, traj = jax.lax.scan(body, z_init, (timesteps, t_embs, step_keys))
            trajectory = (
                jnp.concatenate([z_init[None], traj], axis=0)
                if return_trajectory
                else None
            )

        latent_mean = jnp.mean(latent, axis=0)
        # batch_size is normally a static Python int: branch in Python. (A
        # traced jnp.where would still EVALUATE std(ddof=1) at batch 1 — a
        # 0/0 NaN whose zero cotangent turns into NaN gradients through the
        # differentiable-sweep path.) Under jax.export shape polymorphism
        # (utils/serving.py) it is a symbolic dimension where `> 1` is
        # inconclusive; there the denominator is clamped instead, which is
        # exact for every batch the artifact can serve (ddof=1 for b>1,
        # std 0 for b==1) — fine for the no-gradient serving path.
        if not isinstance(batch_size, int):
            centered = latent - latent_mean[None]
            denom = jnp.maximum(
                jnp.asarray(batch_size - 1, latent.dtype), 1.0
            )
            latent_std = jnp.sqrt(jnp.sum(centered * centered, axis=0) / denom)
        elif batch_size > 1:
            latent_std = jnp.std(latent, axis=0, ddof=1)
        else:
            latent_std = jnp.zeros_like(latent_mean)

        if compute_reconstruction:
            decoded = self.decode_observation(
                params, latent, decode_to_pixels=False if self.is_pixel else True
            )
            reconstruction_error = jnp.mean((decoded - observation) ** 2)
        else:
            reconstruction_error = jnp.zeros((), dtype=latent.dtype)

        return BeliefInfo(
            latent=latent,
            latent_mean=latent_mean,
            latent_std=latent_std,
            reconstruction_error=reconstruction_error,
            trajectory=trajectory,
        )

    # ------------------------------------------------------------------
    # Expected free energy over imagined rollouts (reference :314-396)
    # ------------------------------------------------------------------

    def compute_expected_free_energy(
        self,
        params: Params,
        latent: jnp.ndarray,
        key: jax.Array,
        preference_temperature: jnp.ndarray,
        horizon: Optional[int] = None,
        num_trajectories: Optional[int] = None,
        include_epistemic: Optional[bool] = None,
        first_action: Optional[jnp.ndarray] = None,
        probe_chunk_rows: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """G(pi) accumulated over imagined latent trajectories.

        The (num_trajectories, batch) axes are folded into one batch of size
        T*B and the horizon is a single ``lax.scan``. Per-step terms match the
        reference: pragmatic = w_p * r(z')/tau + V(z', t), consistency =
        -entropy(pi), epistemic = MINE estimate (constant w.r.t. policy
        parameters in the reference too, since it is computed under no_grad,
        reference :410-416).

        In corrected mode the pragmatic term enters with a negative sign so
        minimizing EFE seeks reward (see SemanticsConfig).

        ``first_action`` (B, A), if given, replaces the policy sample at the
        first imagination step — this scores G(a, pi) of committing to a
        candidate action now and following the policy afterwards, the quantity
        EFE-based action selection needs (see ``act_planned``).
        """
        cfg = self.config
        horizon = cfg.efe_horizon if horizon is None else horizon
        num_traj = cfg.num_efe_trajectories if num_trajectories is None else num_trajectories
        if include_epistemic is None:
            # Epistemic term has zero policy gradient (stop-gradient island);
            # corrected mode skips computing it here for speed.
            include_epistemic = cfg.semantics.mode == "faithful" and cfg.epistemic_weight != 0.0

        batch_size = latent.shape[0]
        n = num_traj * batch_size
        z0 = jnp.tile(latent, (num_traj, 1))  # (T*B, D)
        first_action_tiled = (
            None if first_action is None else jnp.tile(first_action, (num_traj, 1))
        )

        prag_sign = cfg.semantics.pragmatic_sign
        prag_w = cfg.pragmatic_weight
        double_w = cfg.semantics.double_pragmatic_weight

        def decoder_fn(z):
            # Epistemic probes go through the decoder in eval mode
            # (reference :948-957), with stopped gradients.
            return self.decode_observation(
                jax.tree_util.tree_map(jax.lax.stop_gradient, params),
                z,
                decode_to_pixels=True,
                train=False,
            )

        def step(z, inputs):
            t_idx, step_key = inputs
            pol_key, dyn_key, epi_key = jax.random.split(step_key, 3)

            dist = self.apply_policy(params["policy"], z)
            action, log_prob = sample_action(dist, pol_key, squash=self.policy_squash)
            if first_action_tiled is not None:
                action = jnp.where(t_idx == 0, first_action_tiled, action)

            next_mean, next_logvar, disagreement = self.imagine_next(
                params["dynamics"], z, action, dyn_key
            )
            if cfg.imagine_deterministic:
                next_z = next_mean
            else:
                eps = jax.random.normal(dyn_key, next_mean.shape, dtype=next_mean.dtype)
                next_z = next_mean + eps * jnp.exp(0.5 * next_logvar)

            reward_mean, reward_std = self.predict_reward(params["reward"], next_z)
            # Same imagination guards as imagined_lambda_objective: the EFE
            # rollout consumes the same learned reward head on the same
            # model-rolled latents.
            reward_mean = self._guard_imagined_reward(
                reward_mean, reward_std, disagreement
            )
            pragmatic = prag_w * (reward_mean / preference_temperature)
            t_batch = jnp.full((n,), t_idx, dtype=z.dtype)
            value = self.apply_value(params["value"], next_z, t_batch)
            # efe_value_weight scales the bootstrap term (1.0 = reference
            # behavior, :355-357); 0 gives pure predicted-reward pragmatics.
            pragmatic = pragmatic + cfg.efe_value_weight * value

            consistency = -dist.entropy()

            if include_epistemic:
                result = estimate_epistemic_value(
                    self.epistemic_estimator,
                    jax.lax.stop_gradient(params["epistemic"]),
                    decoder_fn,
                    jax.lax.stop_gradient(next_mean),
                    jax.lax.stop_gradient(next_logvar),
                    epi_key,
                    # The MINE EMA state only shapes the estimator's BACKWARD
                    # (custom_vjp); this rollout consumes the value under
                    # stop_gradient with train=False, so the forward is
                    # independent of it — no state to thread.
                    jnp.zeros((), dtype=z.dtype),
                    num_samples=cfg.num_ambiguity_samples,
                    train=False,
                    # Pixel agents chunk the ConvDecoder probe expansion
                    # (ntk x samples x T*B rows would OOM the v5e; see
                    # agents/pixel_agent._epistemic_probe_chunk).
                    probe_chunk_rows=probe_chunk_rows,
                )
                epistemic = jax.lax.stop_gradient(result.value)
            else:
                epistemic = jnp.zeros((n,), dtype=z.dtype)

            # Epistemic sign: corrected mode SUBTRACTS information gain from
            # the minimized EFE (info-seeking, p(a) ∝ exp(-G)); faithful mode
            # keeps the reference's additive sign (inert there — the EFE never
            # drives selection, reference :501-510 — but behavior-affecting in
            # act_planned, which compares EFE values). See SemanticsConfig.
            step_efe = (
                cfg.semantics.epistemic_sign * cfg.epistemic_weight * epistemic
                + prag_sign * (prag_w if double_w else 1.0) * pragmatic
                + cfg.consistency_weight * consistency
            )
            discount = cfg.discount_factor ** t_idx
            metrics = (
                jnp.mean(epistemic),
                jnp.mean(pragmatic),
                jnp.mean(consistency),
            )
            return next_z, (discount * step_efe, metrics)

        t_indices = jnp.arange(horizon, dtype=latent.dtype)
        step_keys = jax.random.split(key, horizon)
        _, (step_efes, metrics) = jax.lax.scan(
            step, z0, (t_indices, step_keys)
        )

        # (H, T*B) -> per-original-batch EFE averaged over trajectories
        total = jnp.sum(step_efes, axis=0).reshape(num_traj, batch_size)
        efe = jnp.mean(total, axis=0)

        epi_m, prag_m, cons_m = metrics
        info = {
            "efe/epistemic_mean": jnp.mean(epi_m),
            "efe/pragmatic_mean": jnp.mean(prag_m),
            "efe/consistency_mean": jnp.mean(cons_m),
        }
        return efe, info

    # ------------------------------------------------------------------
    # Dreamer-style imagined lambda objective (no reference counterpart;
    # stabilizer for the EFE policy path — see DEVIATIONS.md)
    # ------------------------------------------------------------------

    def imagined_lambda_objective(
        self,
        params: Params,
        latent: jnp.ndarray,
        key: jax.Array,
        preference_temperature: jnp.ndarray,
        horizon: Optional[int] = None,
        num_trajectories: Optional[int] = None,
        value_params: Optional[Any] = None,
        return_scale: Optional[jnp.ndarray] = None,
        entropy_scale: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Actor loss = -mean imagined lambda-return (+entropy bonus), plus
        the (stop-gradient) imagined states/targets for the critic.

        ``value_params`` overrides the critic used for the bootstrap — pass
        the EMA slow critic (AgentTrainState.target_value) so the actor and
        the critic targets don't chase the live critic's updates.

        ``return_scale`` (scalar; AgentTrainState.return_scale) enables
        Dreamer-v3 return normalization when ``cfg.imagined_return_norm``:
        the actor's returns are divided by max(1, stop_gradient(scale)).
        The per-batch 5th-95th percentile range of the imagined returns is
        reported as ``imagined/return_range`` for the caller's EMA update.

        ``entropy_scale`` (scalar) overrides ``cfg.imagined_entropy_scale``
        — pass exp(AgentTrainState.log_alpha) for SAC-style auto-tuned
        entropy (``cfg.auto_entropy``). With
        ``cfg.imagined_reward_pessimism > 0`` imagined rewards are
        penalized by w * predicted reward std (NLL-calibrated on replay;
        MOPO-style guard against model-error exploitation).

        This is the DreamerV2 actor-critic recipe grafted onto the diffusion
        world model: imagine H steps through the learned dynamics, score them
        with the reward predictor, bootstrap with the value net, and compute
        lambda-returns BACKWARD over the imagined sequence. Unlike the EFE
        pragmatic term (one-step r+V, reference :353-375) this propagates
        long-horizon credit and regresses the critic toward the same imagined
        returns instead of replay-chained targets (reference :638-707 chains
        i.i.d. replay samples as if consecutive).

        Returns ``(actor_loss, (imagined_z, imagined_t, targets), info)``
        where imagined_z: (H, N, D) states z_0..z_{H-1} (stop-gradient),
        imagined_t: (H, N) time indices, targets: (H, N) lambda-returns
        (stop-gradient).
        """
        cfg = self.config
        horizon = cfg.efe_horizon if horizon is None else horizon
        num_traj = (
            cfg.num_efe_trajectories if num_trajectories is None else num_trajectories
        )
        batch_size = latent.shape[0]
        n = num_traj * batch_size
        z0 = jnp.tile(latent, (num_traj, 1))

        def step(z, inputs):
            t_idx, step_key = inputs
            pol_key, dyn_key = jax.random.split(step_key)
            dist = self.apply_policy(params["policy"], z)
            action, _ = sample_action(dist, pol_key, squash=self.policy_squash)
            next_mean, next_logvar, disagreement = self.imagine_next(
                params["dynamics"], z, action, dyn_key
            )
            if cfg.imagine_deterministic:
                next_z = next_mean
            else:
                eps = jax.random.normal(dyn_key, next_mean.shape, next_mean.dtype)
                next_z = next_mean + eps * jnp.exp(0.5 * next_logvar)
            reward_mean, reward_std = self.predict_reward(params["reward"], next_z)
            reward_mean = self._guard_imagined_reward(
                reward_mean, reward_std, disagreement
            )
            if cfg.predict_continuation:
                # P(episode continues) weights the discount (Dreamer-style;
                # without it imagination assumes infinite episodes, which
                # overestimates value wherever termination exists).
                cont = jax.nn.sigmoid(
                    self.predict_continuation(params["continuation"], next_z)
                )
                cont = jax.lax.stop_gradient(cont)
            else:
                cont = jnp.ones_like(reward_mean)
            return next_z, (z, reward_mean, dist.entropy(), cont)

        t_indices = jnp.arange(horizon, dtype=latent.dtype)
        step_keys = jax.random.split(key, horizon)
        z_last, (zs, rewards, entropies, conts) = jax.lax.scan(
            step, z0, (t_indices, step_keys)
        )
        # values bootstrapping the imagined sequence: V(z_{t+1}, t+1)
        zs_next = jnp.concatenate([zs[1:], z_last[None]], axis=0)  # (H, N, D)
        t_next = jnp.broadcast_to((t_indices + 1.0)[:, None], (horizon, n))
        vp = params["value"] if value_params is None else value_params
        values_next = self.apply_value(
            vp, zs_next.reshape(horizon * n, -1),
            t_next.reshape(horizon * n),
        ).reshape(horizon, n)

        rewards = rewards / preference_temperature
        gamma, lam = cfg.discount_factor, cfg.lambda_return

        def backward(carry, inputs):
            r, v_next, c = inputs
            # gamma * c: the continuation head zeroes the bootstrap past
            # predicted termination (c == 1 identically when the feature is
            # off, reducing to the plain lambda-return recursion).
            ret = r + gamma * c * ((1.0 - lam) * v_next + lam * carry)
            return ret, ret

        last = values_next[-1]
        _, returns_rev = jax.lax.scan(
            backward, last, (rewards[::-1], values_next[::-1], conts[::-1])
        )
        lambda_returns = returns_rev[::-1]  # (H, N)

        # Dreamer-v3 return normalization: dividing by the (EMA'd) 5th-95th
        # percentile range keeps the actor gradient and the fixed entropy
        # bonus at a constant relative scale whatever the reward magnitude —
        # without it, model-predicted returns that inflate as the actor
        # exploits world-model error also inflate their own gradient.
        sg = jax.lax.stop_gradient
        return_range = jnp.percentile(sg(lambda_returns), 95.0) - jnp.percentile(
            sg(lambda_returns), 5.0
        )
        if cfg.imagined_return_norm and return_scale is not None:
            norm = jnp.maximum(1.0, sg(return_scale))
        else:
            norm = jnp.asarray(1.0, lambda_returns.dtype)

        # Entropy regularizer at Dreamer's continuous-control scale
        # (imagined_entropy_scale, default 3e-4) — NOT consistency_weight
        # (0.1): at 0.1 the entropy bonus dominates the imagined returns and
        # pins the log-std head at its clamp max (observed: entropy frozen at
        # dim*(1.419+2.0), eval collapsed to constant saturated actions).
        ent_scale = (
            sg(entropy_scale)
            if entropy_scale is not None
            else jnp.asarray(cfg.imagined_entropy_scale, lambda_returns.dtype)
        )
        actor_loss = (
            -jnp.mean(lambda_returns / norm) - ent_scale * jnp.mean(entropies)
        )
        imagined_t = jnp.broadcast_to(t_indices[:, None], (horizon, n))
        info = {
            "imagined/lambda_return_mean": jnp.mean(lambda_returns),
            "imagined/reward_mean": jnp.mean(rewards),
            "imagined/entropy_mean": jnp.mean(entropies),
            "imagined/return_range": return_range,
            "imagined/return_norm": norm,
            "imagined/entropy_scale": ent_scale,
            "imagined/continuation_mean": jnp.mean(conts),
        }
        return actor_loss, (sg(zs), sg(imagined_t), sg(lambda_returns)), info

    # ------------------------------------------------------------------
    # Diffusion ELBO (reference :533-636)
    # ------------------------------------------------------------------

    def elbo_terms(
        self,
        params: Params,
        key: jax.Array,
        observations: jnp.ndarray,
        rewards: jnp.ndarray,
        latents: jnp.ndarray,
        time_importance: jnp.ndarray,
        train: bool = True,
        recon_target: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Compute all ELBO components once; callers assemble per-group losses.

        Returns a dict with scalar terms plus ``per_sample_score_losses`` and
        the sampled times ``t`` (for the importance-sampler update).

        ``recon_target`` overrides the reconstruction target (default:
        ``observations``). Pixel agents pass a stop-gradient copy of the
        encoded features in corrected mode
        (``SemanticsConfig.pixel_recon_target_stopgrad``): with gradients
        flowing through the target, the encoder is rewarded for collapsing
        to constant features (reference pixel_agent.py:317-333 quirk).
        """
        batch_size = observations.shape[0]
        t_key, noise_key, prior_key, drop1, drop2 = jax.random.split(key, 5)

        # Reconstruction (reference :559-566)
        decoded = self.decode_observation(
            params,
            latents,
            decode_to_pixels=False if self.is_pixel else True,
            train=train,
            dropout_key=drop1,
        )
        target = observations if recon_target is None else recon_target
        reconstruction_loss = jnp.mean((decoded - target) ** 2)

        # Importance-sampled continuous time (reference :571-577)
        t = importance_sample_time(time_importance, t_key, batch_size)

        # The score-matching sample treats the latents as a fixed z_0 draw
        # even when the caller passes differentiable latents (ground_beliefs):
        # grounding gradients flow through reconstruction/KL/reward below,
        # never through the score-matching target.
        z0 = jax.lax.stop_gradient(latents)
        noise = jax.random.normal(noise_key, latents.shape, dtype=latents.dtype)
        noisy_latents, qinfo = dproc.continuous_q_sample(
            params["diffusion"], z0, t, noise
        )

        def score_at(z):
            return self.apply_score(
                params["score"], z, t, observations,
                continuous=True, train=train, dropout_key=drop2,
            )

        if self.config.tpu.remat_score_network:
            # Rematerialize the score forward in the backward pass: trades
            # FLOPs for activation memory (useful at large hidden_dim/batch).
            score_at = jax.checkpoint(score_at)

        predicted_score = score_at(noisy_latents)
        # Score target: the reference regresses toward -eps/VARIANCE
        # (reference :594-595) though the true score of continuous_q_sample's
        # z_t = sqrt(alpha) z0 + sqrt(sigma) eps is -eps/sqrt(sigma).
        # Corrected mode now defaults to the TRUE -eps/std target (round-4
        # flip, two preset-scale A/Bs — DEVIATIONS row 11); faithful mode and
        # score_target_convention="reference" opt back into the co-adapted
        # -eps/variance scaling the historical runs were trained under.
        denom = (
            jnp.sqrt(qinfo["sigma"])
            if self.config.semantics.score_target_uses_std
            else qinfo["sigma"]
        )
        true_score = -noise / (denom + 1e-8)
        loss_weight = dproc.compute_loss_weight(params["diffusion"], t)
        score_diff = predicted_score - true_score
        per_sample = loss_weight * jnp.sum(score_diff**2, axis=1)
        score_matching_loss = jnp.mean(per_sample)

        # Gradient penalty: ||d(sum score)/dz||_2 -> 1 (reference :709-729)
        grads = jax.grad(lambda z: jnp.sum(score_at(z)))(
            jax.lax.stop_gradient(noisy_latents)
        )
        # epsilon inside the sqrt: the score net is zero-initialized, and the
        # exact norm has a NaN gradient at 0
        grad_norm = jnp.sqrt(jnp.sum(grads**2, axis=1) + 1e-12)
        grad_penalty = jnp.mean((grad_norm - 1.0) ** 2)

        # KL to learned prior with time annealing (reference :609-611)
        prior_latents = dproc.sample_latent_prior(
            params["diffusion"], prior_key, batch_size
        )
        kl_loss = jnp.mean(0.5 * jnp.sum((latents - prior_latents) ** 2, axis=-1))
        kl_anneal = jnp.exp(-5.0 * jnp.mean(t))

        # Reward prediction NLL (reference :613-618)
        reward_mean, reward_std = self.predict_reward(params["reward"], latents)
        reward_loss = -jnp.mean(reward_log_prob(reward_mean, reward_std, rewards))

        return {
            "reconstruction_loss": reconstruction_loss,
            "score_matching_loss": score_matching_loss,
            "per_sample_score_losses": per_sample,
            "grad_penalty": grad_penalty,
            "kl_loss": kl_loss,
            "kl_anneal": kl_anneal,
            "reward_loss": reward_loss,
            "t": t,
            "mean_time": jnp.mean(t),
            "loss_weight_mean": jnp.mean(loss_weight),
        }

    def assemble_score_loss(self, terms: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Scalar loss for the score+diffusion parameter group.

        corrected: minimize score matching + annealed KL + gradient penalty.
        faithful: the reference's literal -elbo, in which these terms enter
        with *negative* sign (i.e. are ascended; reference :620-636).
        """
        cfg = self.config
        core = (
            cfg.diffusion_weight * terms["score_matching_loss"]
            + cfg.kl_weight * terms["kl_loss"] * terms["kl_anneal"]
            + cfg.grad_penalty_weight * terms["grad_penalty"]
        )
        if cfg.semantics.mode == "faithful":
            return -core
        return core

    def assemble_model_loss(
        self, terms: Dict[str, jnp.ndarray], dynamics_loss: jnp.ndarray
    ) -> jnp.ndarray:
        """Scalar loss for the dynamics+decoder+reward group.

        corrected: reconstruction + reward NLL + dynamics MSE (the reference's
        *intended* partition, agents/state_agent.py:269-274). faithful: only
        the dynamics MSE reaches parameters (the reference wipes decoder /
        reward grads before their optimizer step; see DEVIATIONS.md).
        """
        cfg = self.config
        if cfg.semantics.train_decoder_and_reward:
            return (
                terms["reconstruction_loss"]
                + cfg.reward_weight * terms["reward_loss"]
                + dynamics_loss
            )
        return dynamics_loss

    def elbo_value(self, terms: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """The reference's reported ELBO scalar (reference :620-623), for logging."""
        cfg = self.config
        return (
            -terms["reconstruction_loss"]
            + cfg.kl_weight * terms["kl_loss"] * terms["kl_anneal"]
            + cfg.diffusion_weight * terms["score_matching_loss"]
            + cfg.grad_penalty_weight * terms["grad_penalty"]
            - cfg.reward_weight * terms["reward_loss"]
        )

    # ------------------------------------------------------------------
    # Lambda returns (reference :638-707) — vectorized in core/returns.py
    # ------------------------------------------------------------------

    def lambda_returns(
        self,
        rewards: jnp.ndarray,
        values: jnp.ndarray,
        next_values: jnp.ndarray,
        dones: jnp.ndarray,
        lambda_: Optional[float] = None,
        n_steps: Optional[int] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        return compute_lambda_returns(
            rewards,
            values,
            next_values,
            dones,
            discount=cfg.discount_factor,
            lambda_=cfg.lambda_return if lambda_ is None else lambda_,
            n_steps=cfg.lambda_n_steps if n_steps is None else n_steps,
        )

    # ------------------------------------------------------------------
    # Fokker-Planck belief refinement (C-4a wired behind
    # BeliefDynamicsConfig.use_belief_dynamics)
    # ------------------------------------------------------------------

    def refine_beliefs(
        self,
        params: Params,
        key: jax.Array,
        latent: jnp.ndarray,
        observation: jnp.ndarray,
    ) -> jnp.ndarray:
        """Refine belief latents with Fokker-Planck mean-drift steps on
        -grad F of the decoder likelihood.

        F(z) = ||decode(z) - o||^2 / (2 noise_scale^2) + ||z||^2 / 2, the
        ``observation_model`` form of ``belief_dynamics.total_log_prob``
        (reference core/belief_dynamics.py:174-210). For pixel agents the
        comparison runs in encoded-feature space (``observation`` at act time
        IS the encoded features, and ``decode_to_pixels=False`` selects the
        feature decoder), so no conv decode happens per refinement step.

        The reference declares ``use_belief_dynamics`` but never consumes it
        (its BeliefDynamics is constructed nowhere and ``update()`` calls a
        missing method, reference :170 vs :344). This wiring is the intended
        behavior: acting = reverse-diffusion belief, then ``refine_steps``
        FP drift steps toward the observation mode. No-op when the flag is
        off (callers gate on the config).
        """
        bd = self.config.belief_dynamics
        fp_cfg = FPConfig.from_config(bd)
        p = jax.lax.stop_gradient(params)
        obs = jax.lax.stop_gradient(observation)
        inv_var = 1.0 / (bd.noise_scale**2)

        def free_energy_fn(z: jnp.ndarray) -> jnp.ndarray:
            decoded = self.decode_observation(
                p, z, decode_to_pixels=False, train=False
            )
            flat = (decoded - obs).reshape(z.shape[0], -1)
            obs_nll = 0.5 * inv_var * jnp.sum(flat**2, axis=-1)
            prior = 0.5 * jnp.sum(z**2, axis=-1)
            return obs_nll + prior

        return fp_refine_mean(
            latent, key, fp_cfg, free_energy_fn, num_steps=bd.refine_steps
        )

    def init_free_energy_state(self) -> jnp.ndarray:
        """Learnable log sensory precision for the standalone variational
        free-energy component (core/free_energy), initialized from
        ``config.precision_init`` — the reference's only real consumer of
        that field (reference core/free_energy.py:20-24; exported-but-unwired
        there exactly like the component itself, core/__init__.py:7)."""
        from . import free_energy

        return free_energy.init_free_energy_state(self.config.precision_init)

    # ------------------------------------------------------------------
    # Action selection (reference :478-531)
    # ------------------------------------------------------------------

    def act(
        self,
        params: Params,
        key: jax.Array,
        observation: jnp.ndarray,
        deterministic: bool = False,
        num_steps: Optional[int] = None,
        compute_efe_info: bool = False,
        preference_temperature: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Belief update via reverse diffusion, then policy sample.

        The reference also computes the EFE here but does not use it for
        action selection (reference :501-510); ``compute_efe_info`` replicates
        that for diagnostics.
        """
        if observation.ndim == 1:
            observation = observation[None]
        belief_key, efe_key, act_key = jax.random.split(key, 3)

        if self.config.act_from_posterior:
            latent = self.sample_posterior(
                params["posterior"], belief_key, observation,
                deterministic=self.config.deterministic_beliefs,
            )
            recon_err = jnp.zeros((), dtype=latent.dtype)
            if compute_efe_info:
                decoded = self.decode_observation(
                    params, latent,
                    decode_to_pixels=False if self.is_pixel else True,
                )
                recon_err = jnp.mean((decoded - observation) ** 2)
            belief = BeliefInfo(
                latent=latent,
                latent_mean=jnp.mean(latent, axis=0),
                latent_std=jnp.std(latent, axis=0),
                reconstruction_error=recon_err,
                trajectory=None,
            )
        else:
            belief = self.generate_beliefs(
                params, belief_key, observation, num_steps=num_steps,
                compute_reconstruction=compute_efe_info,
                deterministic=self.config.deterministic_beliefs,
            )
        latent = belief.latent
        if self.config.belief_dynamics.use_belief_dynamics:
            fp_key, act_key = jax.random.split(act_key)
            latent = self.refine_beliefs(params, fp_key, latent, observation)

        dist = self.apply_policy(params["policy"], latent)
        action, log_prob = sample_action(
            dist, act_key, deterministic=deterministic, squash=self.policy_squash
        )

        info: Dict[str, jnp.ndarray] = {
            "action_log_prob": jnp.mean(log_prob),
            "policy_entropy": jnp.mean(dist.entropy()),
        }
        if compute_efe_info:
            temp = (
                preference_temperature
                if preference_temperature is not None
                else jnp.asarray(self.config.preference_temperature)
            )
            efe, efe_info = self.compute_expected_free_energy(
                params, latent, efe_key, temp
            )
            info["expected_free_energy"] = jnp.mean(efe)
            info["reconstruction_error"] = belief.reconstruction_error
            info.update(efe_info)
        return action, info

    def act_planned(
        self,
        params: Params,
        key: jax.Array,
        observation: jnp.ndarray,
        num_candidates: Optional[int] = None,
        plan_temperature: Optional[float] = None,
        num_steps: Optional[int] = None,
        preference_temperature: Optional[jnp.ndarray] = None,
        probe_chunk_rows: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """EFE-based action selection (active-inference decision rule).

        The reference computes the EFE inside ``act`` but never uses it to
        choose the action (reference core/active_inference.py:501-510 — the
        policy sample is returned regardless). This method implements the
        rule that computation implies: score candidate first actions by
        G(a, pi) = EFE of committing to each now and following the policy
        over the imagination horizon, then pick argmin-EFE
        (``plan_temperature == 0``) or sample from the Boltzmann distribution
        softmax(-G/T) over candidates (``plan_temperature > 0``), i.e.
        p(a) ∝ exp(-G(a)) — the canonical active-inference action prior.

        Candidate 0 is always the policy mode (so the plain deterministic
        action is scored too); the rest are policy samples. All candidates
        share ONE imagination key (common random numbers) so their EFEs are
        paired comparisons — independent keys would make argmin pick the
        noise-luckiest rollout rather than the best action. Unlike the
        policy-gradient EFE (where the epistemic term is a zero-gradient
        island, see ``compute_expected_free_energy``), planning compares
        VALUES, so the epistemic term is included whenever
        ``epistemic_weight != 0``.

        Cost: C x num_efe_trajectories x horizon dynamics steps per act.
        Gated by ``ActiveInferenceConfig.plan_candidates`` at the agent level.
        """
        cfg = self.config
        n_cand = cfg.plan_candidates if num_candidates is None else num_candidates
        temp = cfg.plan_temperature if plan_temperature is None else plan_temperature
        if observation.ndim == 1:
            observation = observation[None]
        belief_key, fp_key, cand_key, efe_key, choose_key = jax.random.split(
            key, 5
        )

        if cfg.act_from_posterior:
            latent = self.sample_posterior(
                params["posterior"], belief_key, observation,
                deterministic=cfg.deterministic_beliefs,
            )  # (B, D)
        else:
            belief = self.generate_beliefs(
                params, belief_key, observation, num_steps=num_steps,
                compute_reconstruction=False,
                deterministic=cfg.deterministic_beliefs,
            )
            latent = belief.latent  # (B, D)
        if cfg.belief_dynamics.use_belief_dynamics:
            # fp_key is split from the TOP-level key: splitting the
            # already-consumed belief_key would collide bit-for-bit with
            # generate_beliefs' internal init_key (single-use key contract).
            latent = self.refine_beliefs(params, fp_key, latent, observation)
        batch = latent.shape[0]

        dist = self.apply_policy(params["policy"], latent)

        def sample_candidate(k):
            action, _ = sample_action(dist, k, squash=self.policy_squash)
            return action

        mode_action, _ = sample_action(dist, None, deterministic=True,
                                       squash=self.policy_squash)
        cand_keys = jax.random.split(cand_key, max(n_cand - 1, 1))
        sampled = jax.vmap(sample_candidate)(cand_keys)  # (C-1, B, A)
        candidates = jnp.concatenate([mode_action[None], sampled[: n_cand - 1]], axis=0)

        pref = (
            preference_temperature
            if preference_temperature is not None
            else jnp.asarray(cfg.preference_temperature)
        )
        def score_candidate(action):
            efe, _ = self.compute_expected_free_energy(
                params, latent, efe_key, pref, first_action=action,
                include_epistemic=cfg.epistemic_weight != 0.0,
                probe_chunk_rows=probe_chunk_rows,
            )
            return efe  # (B,)

        efes = jax.vmap(score_candidate)(candidates)  # (C, B)

        if temp and temp > 0.0:
            # Boltzmann selection p(a_c) ∝ exp(-G_c / T) per batch element.
            logits = -efes.T / temp  # (B, C)
            idx = jax.random.categorical(choose_key, logits, axis=-1)  # (B,)
        else:
            idx = jnp.argmin(efes, axis=0)  # (B,)
        action = jnp.take_along_axis(
            candidates, idx[None, :, None], axis=0
        )[0]  # (B, A)

        chosen_efe = jnp.take_along_axis(efes, idx[None, :], axis=0)[0]
        info = {
            "plan/efe_chosen": jnp.mean(chosen_efe),
            "plan/efe_spread": jnp.mean(jnp.max(efes, axis=0) - jnp.min(efes, axis=0)),
            "plan/candidate_efe_mean": jnp.mean(efes),
        }
        return action, info
