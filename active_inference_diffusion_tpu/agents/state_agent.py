"""State-based diffusion active-inference agent with a single jitted train step.

TPU-native counterpart of the reference's ``DiffusionStateAgent``
(reference: active_inference_diffusion/agents/state_agent.py:17-274).

The reference's training step launches three full reverse-diffusion sweeps,
five optimizer steps, and O(B n^2) Python-loop lambda-returns per update
(state_agent.py:110-243). Here the entire update — belief sweep (one batched
sweep for obs and next_obs), score+model gradients (one fused backward; the
parameter groups are block-diagonal so a single grad pass is exact), policy
EFE gradients, value lambda-return regression, and the periodic epistemic MINE
update — is ONE jitted XLA program with a donated train state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs.config import ActiveInferenceConfig, TrainingConfig
from ..core.epistemic import estimate_epistemic_value
from ..core.time_sampler import update_time_importance
from ..models.ema import update_ema
from ..models.policy import sample_action
from .base import AgentTrainState, BaseAgent, merged, subset

Params = Dict[str, Any]


class DiffusionStateAgent(BaseAgent):
    """Agent over raw MuJoCo state observations."""

    PARTITIONS = {
        # reference: agents/state_agent.py:245-274 + base_agent.py:134-139
        "score": ["score", "diffusion"],
        "policy": ["policy"],
        "value": ["value"],
        # "posterior" = amortized q(z|o) (extension; trains on the same
        # reconstruction/reward/KL losses as this group, zero-grad unless
        # cfg.posterior_beliefs routes latents through it)
        "model": ["dynamics", "decoder", "reward", "continuation", "posterior"],
        "epistemic": ["epistemic"],
    }

    def __init__(
        self,
        observation_dim: int,
        action_dim: int,
        config: ActiveInferenceConfig,
        training_config: TrainingConfig,
        pixel_shape: Optional[Tuple[int, int, int]] = None,
    ):
        super().__init__(
            observation_dim, action_dim, config, training_config,
            pixel_shape=pixel_shape,
        )
        donate = (0,) if config.tpu.donate_buffers else ()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=donate)
        self._act = jax.jit(
            self._act_impl, static_argnames=("deterministic", "num_steps")
        )
        self._act_warm = jax.jit(
            self._act_warm_impl, static_argnames=("deterministic", "num_steps")
        )

    # ------------------------------------------------------------------
    # Action selection (reference state_agent.py:72-108)
    # ------------------------------------------------------------------

    def _act_impl(
        self,
        params: Params,
        key: jax.Array,
        observation: jnp.ndarray,
        exploration_noise: jnp.ndarray,
        deterministic: bool = False,
        num_steps: Optional[int] = None,
    ) -> jnp.ndarray:
        feat_key, act_key, noise_key = jax.random.split(key, 3)
        # Featurization hook: identity for states, conv encoder for pixels
        # (the pixel agent overrides _act_features only, not this method).
        features = self._act_features(params, observation, feat_key)
        if self.config.plan_candidates > 0:
            # EFE-based selection over candidate actions (active-inference
            # decision rule; see core.act_planned). Deterministic eval uses
            # argmin-EFE regardless of plan_temperature.
            action, _ = self.core.act_planned(
                params, act_key, features,
                plan_temperature=(
                    0.0 if deterministic else self.config.plan_temperature
                ),
                num_steps=num_steps,
                # Pixel agents chunk the planning-EFE's epistemic decoder
                # probes by batch (same OOM guard as the train step).
                probe_chunk_rows=self._epistemic_probe_chunk(
                    features.shape[0] if features.ndim > 1 else 1
                ),
            )
        else:
            action, _ = self.core.act(
                params, act_key, features,
                deterministic=deterministic, num_steps=num_steps,
            )
        if not deterministic:
            action = action + (
                jax.random.normal(noise_key, action.shape, dtype=action.dtype)
                * exploration_noise
            )
        # Always clip to the action space: the policy head is unsquashed by
        # default (matching the reference), and the reference only ever acts
        # through its noisy path which clips (state_agent.py:104-107) — its
        # evaluate_agent never passes deterministic=True (quirk #6,
        # DEVIATIONS.md). Unclipped deterministic actions destabilize MuJoCo.
        return jnp.clip(action, -1.0, 1.0)

    def _acting_params(self, state: AgentTrainState) -> Params:
        """Parameters used at act/eval time; substitutes the EMA shadow of the
        score network when ``use_ema_for_act`` is set (the reference maintains
        the EMA but never applies it, base_agent.py:73-77)."""
        p = state.params
        if self.config.use_ema_for_act:
            p = dict(p)
            p["score"] = state.ema_score
        if self.config.act_with_policy_ema and state.ema_policy is not None:
            p = dict(p)
            p["policy"] = state.ema_policy
        return p

    def _act_features(
        self, params: Params, observation: jnp.ndarray, key: jax.Array
    ) -> jnp.ndarray:
        """Observation featurization for acting; identity for state agents
        (pixel agents apply the conv encoder)."""
        del params, key
        return observation

    def _act_warm_impl(
        self,
        params: Params,
        key: jax.Array,
        observation: jnp.ndarray,
        exploration_noise: jnp.ndarray,
        prev_latent: jnp.ndarray,
        reset_mask: jnp.ndarray,  # (N,) bool: True -> start from fresh noise
        deterministic: bool = False,
        num_steps: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Warm-start partial-denoising act: the sweep starts from the
        previous control step's belief (forward-noised to the truncation
        timestep) instead of pure noise — consecutive observations are
        similar, so a short sweep suffices (cf. Falcon, arXiv:2503.00339).
        Returns (action, belief_latent) so the caller can thread the belief."""
        feat_key, belief_key, act_key, noise_key, reset_key = jax.random.split(key, 5)
        features = self._act_features(params, observation, feat_key)
        if self.config.act_from_posterior:
            # Posterior acting needs no warm start (one encoder forward);
            # the previous latent is ignored, the interface is preserved.
            latent = self.core.sample_posterior(
                params["posterior"], belief_key, features,
                deterministic=self.config.deterministic_beliefs,
            )
        else:
            # Fresh standard-normal start for reset envs: q_sample maps a
            # N(0, I) z_init to an exactly standard-normal sweep start.
            fresh = jax.random.normal(reset_key, prev_latent.shape, prev_latent.dtype)
            z_prev = jnp.where(reset_mask[:, None], fresh, prev_latent)
            belief = self.core.generate_beliefs(
                params, belief_key, features, num_steps=num_steps,
                compute_reconstruction=False, z_init=z_prev,
                deterministic=self.config.deterministic_beliefs,
            )
            latent = belief.latent
        if self.config.belief_dynamics.use_belief_dynamics:
            fp_key, act_key = jax.random.split(act_key)
            latent = self.core.refine_beliefs(params, fp_key, latent, features)
        dist = self.core.apply_policy(params["policy"], latent)
        from ..models.policy import sample_action as _sample

        action, _ = _sample(
            dist, act_key, deterministic=deterministic,
            squash=self.core.policy_squash,
        )
        if not deterministic:
            action = action + (
                jax.random.normal(noise_key, action.shape, dtype=action.dtype)
                * exploration_noise
            )
        return jnp.clip(action, -1.0, 1.0), latent

    def act_warm(
        self,
        state: AgentTrainState,
        observation: np.ndarray,
        key: jax.Array,
        prev_latents: jnp.ndarray,
        reset_mask: np.ndarray,
        deterministic: bool = False,
        num_steps: Optional[int] = None,
    ) -> Tuple[np.ndarray, jnp.ndarray]:
        """Host entry point for warm-start acting; returns (actions, latents)."""
        obs = jnp.asarray(observation, jnp.float32 if not self.config.pixel_observation else None)
        actions, latents = self._act_warm(
            self._acting_params(state), key, obs,
            jnp.asarray(self.exploration_noise, jnp.float32),
            prev_latents, jnp.asarray(reset_mask, bool),
            deterministic=deterministic,
            num_steps=(
                num_steps
                if num_steps is not None
                else self.training_config.collect_diffusion_steps
            ),
        )
        return np.asarray(actions), latents

    def act(
        self,
        state: AgentTrainState,
        observation: np.ndarray,
        key: jax.Array,
        deterministic: bool = False,
        collect: bool = True,
    ) -> np.ndarray:
        """Host entry point; batched observations (N, obs_dim) -> actions (N, A)."""
        obs = jnp.asarray(observation, jnp.float32)
        if obs.ndim == 1:
            obs = obs[None]
        num_steps = (
            self.training_config.collect_diffusion_steps if collect else None
        )
        return np.asarray(
            self._act(
                self._acting_params(state),
                key,
                obs,
                jnp.asarray(self.exploration_noise, jnp.float32),
                deterministic=deterministic,
                num_steps=num_steps,
            )
        )

    # ------------------------------------------------------------------
    # Training step
    # ------------------------------------------------------------------

    def train_step(
        self, state: AgentTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[AgentTrainState, Dict[str, jnp.ndarray]]:
        state, metrics = self._train_step(state, batch)
        self.total_steps += 1
        return state, metrics

    def _epistemic_probe_chunk(self, batch_rows: int):
        """Row-block size for the MINE Jacobian probes through the decoder.
        None (states) = one fused vmap; the pixel agent chunks by batch so
        the 84x84 ConvDecoder never sees the full ntk x samples x batch
        expansion (measured >4 GB per conv layer -> HBM OOM on v5e)."""
        del batch_rows
        return None

    def _encode_batch(
        self,
        params: Params,
        batch: Dict[str, jnp.ndarray],
        key: jax.Array,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Observation featurization hook; identity for state agents. Pixel
        agents apply augmentation + conv encoding here — called both outside
        the loss (stop-gradient, for the belief sweep) and inside the fused
        loss (so encoder parameters receive ELBO/contrastive gradients), with
        the same key so the augmentation sample is shared."""
        del params, key, train
        return batch["observations"], batch["next_observations"]

    def _extra_score_loss(
        self,
        params: Params,
        batch: Dict[str, jnp.ndarray],
        enc_obs: jnp.ndarray,
        enc_next_obs: jnp.ndarray,
        latents: jnp.ndarray,
        next_latents: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Hook for extra representation losses (pixel contrastive)."""
        del params, batch, enc_obs, enc_next_obs, latents, next_latents
        return jnp.zeros(()), {}

    def _train_step_impl(
        self, state: AgentTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[AgentTrainState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        core = self.core
        params = state.params

        rng, belief_key, elbo_key, policy_key, value_key, epi_key, enc_key = (
            jax.random.split(state.rng, 7)
        )
        metrics: Dict[str, jnp.ndarray] = {}

        # Reward normalization (reference state_agent.py:126-133; the reference
        # round-trips through numpy on host — here it stays on device).
        rewards = batch["rewards"]
        new_reward_norm = state.reward_norm.update(rewards)
        norm_rewards = new_reward_norm.normalize(rewards)

        # Featurize observations for the belief sweep (stop-gradient; pixel
        # agents re-encode inside the fused loss for encoder gradients)
        sg_params = jax.lax.stop_gradient(params)
        enc_obs, enc_next_obs = self._encode_batch(sg_params, batch, enc_key)

        # --- 1. Belief generation: ONE batched sweep for obs + next_obs
        # (the reference runs three separate sweeps per train step,
        # state_agent.py:134-140 and :195-197). With cfg.ground_beliefs the
        # sweep instead runs INSIDE the fused loss so reconstruction/KL/reward
        # gradients reach the score network through the (reparameterizable)
        # denoising chain; same keys -> identical sample either way. With
        # cfg.posterior_beliefs the training latents come from the amortized
        # posterior q(z|o) (also inside the fused loss, so the encoder trains
        # on reconstruction/reward/KL) and the score net learns to sample it.
        ground = cfg.ground_beliefs
        posterior = cfg.posterior_beliefs
        if ground or posterior:
            latents = next_latents = None  # produced inside the fused loss
        else:
            both = jnp.concatenate(
                [jax.lax.stop_gradient(enc_obs), jax.lax.stop_gradient(enc_next_obs)],
                axis=0,
            )
            belief = core.generate_beliefs(
                sg_params, belief_key, both, compute_reconstruction=False,
                deterministic=cfg.deterministic_beliefs,
            )
            latents, next_latents = jnp.split(
                jax.lax.stop_gradient(belief.latent), 2, axis=0
            )

        actions = batch["actions"]
        dones = batch["dones"]

        # --- 2. Fused score+diffusion and model (dynamics/decoder/reward)
        # update. The two groups have block-diagonal loss dependence, so one
        # grad pass computes both partitions exactly.
        fused_groups = self.PARTITIONS["score"] + self.PARTITIONS["model"]

        def fused_loss_fn(sub: Params):
            p = merged(params, sub)
            # Re-encode inside the loss (same key -> same augmentation) so
            # encoder params in `sub` receive gradients; identity for states.
            enc_obs_l, enc_next_obs_l = self._encode_batch(p, batch, enc_key)
            if posterior:
                both_l = jnp.concatenate([enc_obs_l, enc_next_obs_l], axis=0)
                z_post = core.sample_posterior(
                    p["posterior"], belief_key, both_l,
                    deterministic=cfg.deterministic_beliefs,
                )
                lat_l, next_lat_l = jnp.split(z_post, 2, axis=0)
            elif ground:
                both_l = jnp.concatenate([enc_obs_l, enc_next_obs_l], axis=0)
                belief_l = core.generate_beliefs(
                    p, belief_key, both_l, compute_reconstruction=False,
                    deterministic=cfg.ground_beliefs and cfg.deterministic_beliefs,
                )
                lat_l, next_lat_l = jnp.split(belief_l.latent, 2, axis=0)
            else:
                lat_l, next_lat_l = latents, next_latents
            terms = core.elbo_terms(
                p, elbo_key, enc_obs_l, norm_rewards, lat_l,
                state.time_importance, train=True,
                # Corrected mode: encoder features as recon TARGET are
                # stop-gradiented (anti-collapse); conditioning and the
                # contrastive loss still carry encoder gradients.
                recon_target=(
                    jax.lax.stop_gradient(enc_obs_l)
                    if core.is_pixel
                    and cfg.semantics.pixel_recon_target_stopgrad
                    else None
                ),
            )
            score_loss = core.assemble_score_loss(terms)

            extra_loss, extra_info = self._extra_score_loss(
                p, batch, enc_obs_l, enc_next_obs_l, lat_l, next_lat_l
            )

            # Dynamics regression is on fixed belief samples in both modes.
            lat_sg = jax.lax.stop_gradient(lat_l)
            next_lat_sg = jax.lax.stop_gradient(next_lat_l)
            # All ensemble members fit the same replay transitions (member
            # diversity comes from independent inits, MBPO-style); K = 1
            # reduces to the reference's single-net MSE.
            pred_members = core.predict_next_latent_members(
                p["dynamics"], lat_sg, actions
            )
            dynamics_loss = jnp.mean((pred_members - next_lat_sg[None]) ** 2)
            # Continuation head c(z_next) vs (1 - done) — Dreamer-style
            # discount prediction (always trained; used in imagination only
            # with cfg.predict_continuation).
            cont_logit = core.predict_continuation(p["continuation"], next_lat_sg)
            continuation_loss = jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    cont_logit, 1.0 - batch["dones"].astype(cont_logit.dtype)
                )
            )
            model_loss = (
                core.assemble_model_loss(terms, dynamics_loss) + continuation_loss
            )

            total = score_loss + extra_loss + model_loss
            aux = (terms, dynamics_loss, continuation_loss, extra_info, lat_sg, next_lat_sg)
            return total, aux

        (
            (
                fused_loss,
                (terms, dynamics_loss, continuation_loss, extra_info,
                 latents, next_latents),
            ),
            fused_grads,
        ) = jax.value_and_grad(fused_loss_fn, has_aux=True)(
            subset(params, fused_groups)
        )

        new_params = dict(params)
        new_opt_states = dict(state.opt_states)
        for name in ("score", "model"):
            group_keys = self.PARTITIONS[name]
            g = {k: fused_grads[k] for k in group_keys}
            sub_params = subset(params, group_keys)
            updates, new_opt_states[name] = self.optimizers[name].update(
                g, state.opt_states[name], sub_params
            )
            new_sub = optax.apply_updates(sub_params, updates)
            new_params.update(new_sub)

        new_ema = update_ema(state.ema_score, new_params["score"], cfg.ema_decay)
        new_time_importance = update_time_importance(
            state.time_importance,
            terms["t"],
            jax.lax.stop_gradient(terms["per_sample_score_losses"]),
        )

        metrics.update(
            reconstruction_loss=terms["reconstruction_loss"],
            kl_loss=terms["kl_loss"],
            score_matching_loss=terms["score_matching_loss"],
            grad_penalty=terms["grad_penalty"],
            reward_loss=terms["reward_loss"],
            elbo=core.elbo_value(terms),
            mean_time=terms["mean_time"],
            loss_weight_mean=terms["loss_weight_mean"],
            dynamics_loss=dynamics_loss,
            continuation_loss=continuation_loss,
            **extra_info,
        )

        # --- 3. Policy update (reference state_agent.py:161-180). With
        # cfg.imagined_value_targets the actor maximizes imagined
        # lambda-returns (Dreamer-style) instead of the mean EFE.

        # Warmup gate (cfg.policy_anchor_warmup_steps): 0 until the gate
        # step, then the configured weight. Traced on state.step, so one
        # compiled program serves the whole run.
        anchor_weight = cfg.policy_anchor_weight * jnp.where(
            state.step >= cfg.policy_anchor_warmup_steps, 1.0, 0.0
        )

        def policy_anchor(p_policy: Params) -> jnp.ndarray:
            """Mean KL(pi_live || pi_ema) on the replay belief latents —
            the late-run drift anchor (cfg.policy_anchor_weight)."""
            if cfg.policy_anchor_weight <= 0 or state.ema_policy is None:
                return jnp.zeros(())
            from ..models.policy import gaussian_kl

            z_sg = jax.lax.stop_gradient(latents)
            live = core.apply_policy(p_policy, z_sg)
            ref = core.apply_policy(
                jax.lax.stop_gradient(state.ema_policy), z_sg
            )
            return jnp.mean(gaussian_kl(live, ref))

        if cfg.imagined_value_targets:

            def policy_loss_fn(sub: Params):
                p = merged(new_params, sub)
                actor_loss, imag, info = core.imagined_lambda_objective(
                    p, latents, policy_key, state.preference_temperature,
                    value_params=state.target_value,
                    return_scale=state.return_scale,
                    entropy_scale=(
                        jnp.exp(state.log_alpha) if cfg.auto_entropy else None
                    ),
                )
                anchor = policy_anchor(p["policy"])
                info = dict(info, policy_anchor_kl=anchor)
                actor_loss = actor_loss + anchor_weight * anchor
                return actor_loss, (imag, info)

            (policy_loss, (imagination, efe_info)), policy_grads = (
                jax.value_and_grad(policy_loss_fn, has_aux=True)(
                    subset(new_params, self.PARTITIONS["policy"])
                )
            )
        else:
            imagination = None

            def policy_loss_fn(sub: Params):
                p = merged(new_params, sub)
                efe, efe_info = core.compute_expected_free_energy(
                    p, latents, policy_key, state.preference_temperature,
                )
                anchor = policy_anchor(p["policy"])
                efe_info = dict(efe_info, policy_anchor_kl=anchor)
                return (
                    jnp.mean(efe) + anchor_weight * anchor,
                    efe_info,
                )

            (policy_loss, efe_info), policy_grads = jax.value_and_grad(
                policy_loss_fn, has_aux=True
            )(subset(new_params, self.PARTITIONS["policy"]))

        updates, new_opt_states["policy"] = self.optimizers["policy"].update(
            policy_grads,
            state.opt_states["policy"],
            subset(new_params, self.PARTITIONS["policy"]),
        )
        new_params.update(
            optax.apply_updates(subset(new_params, self.PARTITIONS["policy"]), updates)
        )
        metrics["policy_loss"] = policy_loss
        metrics.update(efe_info)

        # --- 4. Value update. Imagined-lambda mode: regress V on the
        # imagined states toward the imagined lambda-returns (the critic and
        # actor share one imagination batch, as in Dreamer). Default:
        # replay lambda-return targets (reference state_agent.py:183-215;
        # next_latents reused instead of a third diffusion sweep).
        if cfg.imagined_value_targets:
            zs_im, ts_im, tgt_im = imagination
            h, n = tgt_im.shape
            zs_flat = zs_im.reshape(h * n, -1)
            ts_flat = ts_im.reshape(h * n)
            tgt_flat = tgt_im.reshape(h * n)

            # Slow-critic regularizer (Dreamer-v3): anchor the live critic to
            # its own EMA's predictions on the imagined distribution so the
            # (actor -> returns -> critic -> bootstrap) loop cannot co-drift.
            v_ema = jax.lax.stop_gradient(
                core.apply_value(state.target_value, zs_flat, ts_flat)
            )

            def value_loss_fn(sub: Params):
                v = core.apply_value(sub["value"], zs_flat, ts_flat)
                return jnp.mean(optax.huber_loss(v, tgt_flat)) + (
                    cfg.value_ema_regularizer
                    * jnp.mean(optax.huber_loss(v, v_ema))
                )

        else:
            b = latents.shape[0]
            t_now = jnp.zeros((b,), latents.dtype)
            t_next = jnp.ones((b,), latents.dtype)
            next_values = jax.lax.stop_gradient(
                core.apply_value(new_params["value"], next_latents, t_next)
            )
            cur_values = jax.lax.stop_gradient(
                core.apply_value(new_params["value"], latents, t_now)
            )
            targets = jax.lax.stop_gradient(
                core.lambda_returns(norm_rewards, cur_values, next_values, dones)
            )

            def value_loss_fn(sub: Params):
                v = core.apply_value(sub["value"], latents, t_now)
                return jnp.mean(optax.huber_loss(v, targets))

        value_loss, value_grads = jax.value_and_grad(value_loss_fn)(
            subset(new_params, self.PARTITIONS["value"])
        )
        updates, new_opt_states["value"] = self.optimizers["value"].update(
            value_grads,
            state.opt_states["value"],
            subset(new_params, self.PARTITIONS["value"]),
        )
        new_params.update(
            optax.apply_updates(subset(new_params, self.PARTITIONS["value"]), updates)
        )
        metrics["value_loss"] = value_loss

        # --- 5. Epistemic MINE update every N steps
        # (reference state_agent.py:217-222, core/active_inference.py:420-445)
        def decoder_fn(z):
            return core.decode_observation(
                jax.tree_util.tree_map(jax.lax.stop_gradient, new_params),
                z, decode_to_pixels=True, train=False,
            )

        next_mean, next_logvar = core.predict_next_latent(
            jax.lax.stop_gradient(new_params["dynamics"]), latents, actions
        )

        def epistemic_update(operand):
            epi_params, opt_state, running_mean = operand

            def epi_loss_fn(ep):
                result = estimate_epistemic_value(
                    core.epistemic_estimator, ep["epistemic"], decoder_fn,
                    next_mean, next_logvar, epi_key, running_mean,
                    num_samples=5, train=True,
                    # Pixel agents: run the probe batch through the conv
                    # decoder in batch-size blocks — the fully-vmapped
                    # ntk x samples x batch expansion OOMs HBM (>4 GB conv
                    # activations per layer at batch 128 on a 16 GB v5e).
                    probe_chunk_rows=self._epistemic_probe_chunk(
                        latents.shape[0]
                    ),
                )
                return -result.mi_lower_bound, result

            (neg_mi, result), g = jax.value_and_grad(epi_loss_fn, has_aux=True)(
                epi_params
            )
            upd, new_opt = self.optimizers["epistemic"].update(
                g, opt_state, epi_params
            )
            new_epi = optax.apply_updates(epi_params, upd)
            return new_epi, new_opt, result.running_mean, -neg_mi

        def epistemic_skip(operand):
            epi_params, opt_state, running_mean = operand
            return epi_params, opt_state, running_mean, jnp.zeros(())

        do_epi = (state.step % cfg.epistemic_update_every) == 0
        epi_operand = (
            subset(new_params, self.PARTITIONS["epistemic"]),
            state.opt_states["epistemic"],
            state.epistemic_running_mean,
        )
        new_epi_params, new_opt_states["epistemic"], new_running_mean, epistemic_mi = (
            jax.lax.cond(do_epi, epistemic_update, epistemic_skip, epi_operand)
        )
        new_params.update(new_epi_params)
        metrics["epistemic_mi"] = epistemic_mi

        # Slow critic tracks the live critic (bootstrap source for the
        # imagined-lambda mode; carried untouched otherwise — the field must
        # exist either way for pytree-structure stability).
        if cfg.imagined_value_targets:
            new_target_value = update_ema(
                state.target_value, new_params["value"], cfg.target_value_decay
            )
            # EMA of the imagined-return percentile range (Dreamer-v3 return
            # normalization scale; consumed next step by the actor loss).
            new_return_scale = (
                cfg.return_norm_decay * state.return_scale
                + (1.0 - cfg.return_norm_decay) * efe_info["imagined/return_range"]
            )
            if cfg.auto_entropy:
                # SAC alpha update in log space: dJ/d(alpha) = H - H_target,
                # so alpha shrinks while entropy exceeds the target and
                # grows while it falls short.
                ent_target = (
                    cfg.entropy_target
                    if cfg.entropy_target is not None
                    else -float(self.action_dim)
                )
                new_log_alpha = jnp.clip(
                    state.log_alpha
                    - cfg.alpha_lr * (efe_info["imagined/entropy_mean"] - ent_target),
                    # alpha in [1e-6, 10]: the update is a fixed-rate random
                    # walk while entropy sits off-target, so an unbounded
                    # log_alpha would eventually overflow on long runs.
                    -13.8155,
                    2.3026,
                )
            else:
                new_log_alpha = state.log_alpha
        else:
            new_target_value = state.target_value
            new_return_scale = state.return_scale
            new_log_alpha = state.log_alpha

        new_ema_policy = (
            update_ema(
                state.ema_policy, new_params["policy"], cfg.policy_ema_decay
            )
            if state.ema_policy is not None
            else None
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_states=new_opt_states,
            ema_score=new_ema,
            ema_policy=new_ema_policy,
            target_value=new_target_value,
            return_scale=new_return_scale,
            log_alpha=new_log_alpha,
            time_importance=new_time_importance,
            epistemic_running_mean=new_running_mean,
            reward_norm=new_reward_norm,
            rng=rng,
        )
        return new_state, metrics
