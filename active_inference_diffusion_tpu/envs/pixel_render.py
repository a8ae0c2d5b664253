"""On-device pixel environments: pure-JAX rasterization of analytic envs.

No reference counterpart — the reference renders pixels on the HOST through
the MuJoCo renderer + PIL resize (reference: envs/pixel_wrappers.py:101-204),
capping pixel collection at the host render rate (~8-17 env-steps/s here).
Rendering the observation *inside* the jitted program keeps the whole
collect-train loop on device: the rasterizer is a few thousand fused VPU ops
per frame, vmapped over envs, so pixel agents train from thousands of
on-device env steps per second through ``fused_collect``
(envs/jax_envs.py).

The raster model is deliberately simple (distance-field strokes on a uint8
canvas): the point is an *informative* 84x84x3 observation with exact task
physics underneath, frame-stacked so velocity is visible — the same
observation contract as ``make_pixel_mujoco`` (84x84, stack 3,
channels-first uint8).

Envs: ``PendulumPixels`` / ``ReacherPixels`` (analytic physics),
``make_planar_pixels`` (the planar MuJoCo tasks of envs/planar.py with a
tracking camera), and ``make_rigid3d_pixels`` (the 3D Ant/Humanoid family
of envs/rigid3d.py through a perspective tracking camera).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .jax_envs import EnvState, Pendulum, Reacher2Link


def _segment_distance(
    yy: jnp.ndarray, xx: jnp.ndarray,
    p0: jnp.ndarray, p1: jnp.ndarray,
) -> jnp.ndarray:
    """Distance from every pixel (yy, xx) to the segment p0->p1 (x, y)."""
    d = p1 - p0
    len_sq = jnp.sum(d**2) + 1e-8
    t = ((xx - p0[0]) * d[0] + (yy - p0[1]) * d[1]) / len_sq
    t = jnp.clip(t, 0.0, 1.0)
    cx = p0[0] + t * d[0]
    cy = p0[1] + t * d[1]
    return jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)


class PixelStackMixin:
    """Frame-stacked uint8 pixel observations for on-device rendered envs.

    Subclasses call ``_init_raster(size, frame_stack)`` in ``__init__`` and
    implement ``_render_state(state) -> (3, H, W) uint8``; reset/step here
    maintain the (frame_stack*3, H, W) channels-first stack (the layout
    ``DiffusionPixelAgent._to_nhwc_float`` consumes).
    """

    def _init_raster(self, size: int, frame_stack: int) -> None:
        self.size = size
        self.frame_stack = frame_stack
        self.obs_shape = (frame_stack * 3, size, size)
        ys = jnp.arange(size, dtype=jnp.float32)
        self._yy, self._xx = jnp.meshgrid(ys, ys, indexing="ij")
        self._center = jnp.array([size / 2.0, size / 2.0])

    # Pixel envs expose ``obs_shape``; a flat observation_dim would size
    # state-agent networks/replay wrongly — fail fast instead of inheriting
    # the underlying state env's scalar.
    @property
    def observation_dim(self):
        raise AttributeError(
            f"{type(self).__name__} produces pixel observations "
            f"(obs_shape={getattr(self, 'obs_shape', None)}); use obs_shape "
            "with DiffusionPixelAgent, not observation_dim"
        )

    @observation_dim.setter
    def observation_dim(self, _value):
        # tolerate the state-env base __init__ assigning its own dim
        pass

    def _render_state(self, state: EnvState) -> jnp.ndarray:
        raise NotImplementedError

    def reset(self, key: jax.Array) -> EnvState:
        state = super().reset(key)
        frame = self._render_state(state)
        return state.replace(obs=jnp.tile(frame, (self.frame_stack, 1, 1)))

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        next_state = super().step(state, action)
        frame = self._render_state(next_state)
        return next_state.replace(
            obs=jnp.concatenate([state.obs[3:], frame], axis=0)
        )


class PendulumPixels(PixelStackMixin, Pendulum):
    """Pendulum-v1 with on-device rendered pixel observations.

    Physics/reward/termination are inherited (exact Gymnasium Pendulum-v1
    semantics, cross-validated in tests/test_jax_envs.py). theta=0 renders
    the rod pointing UP (the Gymnasium screen convention).
    """

    def __init__(self, size: int = 84, frame_stack: int = 3):
        self._init_raster(size, frame_stack)
        self._rod_len = 0.36 * size
        self._rod_width = 0.05 * size
        # Gymnasium's rod/background palette (salmon rod, white bg, dark axle)
        self._rod_color = jnp.array([204.0, 77.0, 77.0])
        self._axle_color = jnp.array([40.0, 40.0, 40.0])

    def render_frame(self, theta: jnp.ndarray) -> jnp.ndarray:
        """(3, H, W) uint8 frame for a pole angle (0 = up, + = ccw)."""
        # screen coords: x right, y down; theta=0 points up
        tip = self._center + self._rod_len * jnp.stack(
            [jnp.sin(theta), -jnp.cos(theta)]
        )
        dist = _segment_distance(self._yy, self._xx, self._center, tip)
        # soft 1px antialiased edge
        rod_alpha = jnp.clip(self._rod_width / 2.0 + 0.5 - dist, 0.0, 1.0)
        axle_dist = jnp.sqrt(
            (self._xx - self._center[0]) ** 2 + (self._yy - self._center[1]) ** 2
        )
        axle_alpha = jnp.clip(self._rod_width / 3.0 + 0.5 - axle_dist, 0.0, 1.0)

        canvas = jnp.full((self.size, self.size, 3), 255.0)
        canvas = (
            canvas * (1.0 - rod_alpha)[..., None]
            + self._rod_color * rod_alpha[..., None]
        )
        canvas = (
            canvas * (1.0 - axle_alpha)[..., None]
            + self._axle_color * axle_alpha[..., None]
        )
        return jnp.moveaxis(canvas, -1, 0).astype(jnp.uint8)  # (3, H, W)

    def _render_state(self, state: EnvState) -> jnp.ndarray:
        return self.render_frame(state.physics[0])


class ReacherPixels(PixelStackMixin, Reacher2Link):
    """Planar 2-link reacher with on-device rendered pixel observations.

    The frame shows both links (distinct colors) and the target as a filled
    dot — a goal-conditioned pixel task: the agent must locate the target
    in the image, there is no state-side shortcut. Physics/reward inherit
    from ``Reacher2Link`` (jax_envs.py).
    """

    def __init__(self, size: int = 84, frame_stack: int = 3):
        self._init_raster(size, frame_stack)
        # workspace radius 1.0 (two 0.5 links) + margin maps onto the frame
        self._scale = size / 2.4
        self._stroke = 0.035 * size
        self._link1_color = jnp.array([204.0, 77.0, 77.0])
        self._link2_color = jnp.array([77.0, 77.0, 204.0])
        self._target_color = jnp.array([60.0, 170.0, 60.0])

    def _to_screen(self, xy: jnp.ndarray) -> jnp.ndarray:
        """World (x right, y up) -> screen (x right, y down) pixel coords."""
        return self._center + jnp.stack([xy[0], -xy[1]]) * self._scale

    def render_frame(
        self, q: jnp.ndarray, target: jnp.ndarray
    ) -> jnp.ndarray:
        """(3, H, W) uint8 frame for joint angles q and target position."""
        elbow = jnp.stack([jnp.cos(q[0]), jnp.sin(q[0])]) * 0.5
        tip = elbow + jnp.stack([jnp.cos(q[0] + q[1]), jnp.sin(q[0] + q[1])]) * 0.5
        p0 = self._to_screen(jnp.zeros(2))
        p1 = self._to_screen(elbow)
        p2 = self._to_screen(tip)
        pt = self._to_screen(target)

        half = self._stroke / 2.0 + 0.5
        a1 = jnp.clip(half - _segment_distance(self._yy, self._xx, p0, p1), 0.0, 1.0)
        a2 = jnp.clip(half - _segment_distance(self._yy, self._xx, p1, p2), 0.0, 1.0)
        td = jnp.sqrt((self._xx - pt[0]) ** 2 + (self._yy - pt[1]) ** 2)
        at = jnp.clip(self._stroke + 0.5 - td, 0.0, 1.0)

        canvas = jnp.full((self.size, self.size, 3), 255.0)
        canvas = canvas * (1 - at)[..., None] + self._target_color * at[..., None]
        canvas = canvas * (1 - a1)[..., None] + self._link1_color * a1[..., None]
        canvas = canvas * (1 - a2)[..., None] + self._link2_color * a2[..., None]
        return jnp.moveaxis(canvas, -1, 0).astype(jnp.uint8)

    def _render_state(self, state: EnvState) -> jnp.ndarray:
        return self.render_frame(state.physics[:2], state.physics[4:6])


_BODY_PALETTE = jnp.array(
    [
        [204.0, 77.0, 77.0],
        [77.0, 77.0, 204.0],
        [60.0, 170.0, 60.0],
        [204.0, 154.0, 51.0],
        [154.0, 77.0, 204.0],
        [51.0, 178.0, 204.0],
        [178.0, 204.0, 51.0],
        [204.0, 77.0, 154.0],
    ]
)


def make_planar_pixels(env_name: str, size: int = 84, frame_stack: int = 3):
    """Pixel variant of a planar MuJoCo task: the frame is rasterized ON
    DEVICE from the planar engine's forward kinematics — a tracking camera
    following the torso, each body's capsule geoms (``PlanarModel.geom_*``,
    the same segments the contact model uses) drawn as distance-field
    strokes with per-body colors, the floor as a shaded half-plane with 1 m
    tick marks so forward motion is visible despite the tracking camera.
    This is the pixel-MuJoCo capability the reference gets from host MuJoCo
    rendering at ~8-17 env-steps/s (reference envs/pixel_wrappers.py:101-204),
    fused into the jitted rollout instead.

    Registered names: ``HopperPlanarPixels-v0`` / ``Walker2dPlanarPixels-v0``
    / ``HalfCheetahPlanarPixels-v0`` (envs/jax_envs.make_jax_env). Lazy
    import avoids a module cycle; the class is created per call.
    """
    from .planar import PlanarMJCEnv, forward_kinematics, _rot

    class _PlanarPixels(PixelStackMixin, PlanarMJCEnv):
        def __init__(self):
            super().__init__(env_name)
            self._init_raster(size, frame_stack)
            # camera: ~3.2 m of world height in frame; centered on torso x
            self._scale = size / 3.2
            self._cam_z = 0.9  # world z at the vertical frame center

        def _to_screen(self, xz: jnp.ndarray, cam_x: jnp.ndarray) -> jnp.ndarray:
            sx = (xz[0] - cam_x) * self._scale + self.size / 2.0
            sy = (self._cam_z - xz[1]) * self._scale + self.size / 2.0
            return jnp.stack([sx, sy])

        def render_frame(self, qpos: jnp.ndarray) -> jnp.ndarray:
            model = self.model
            pos, th = forward_kinematics(model, qpos)
            cam_x = pos[1, 0]  # track the torso
            canvas = jnp.full((self.size, self.size, 3), 255.0)
            # floor: darken everything below z=0
            floor_sy = self._cam_z * self._scale + self.size / 2.0
            below = jnp.clip(self._yy - floor_sy + 0.5, 0.0, 1.0)
            floor_color = jnp.array([210.0, 200.0, 180.0])
            canvas = canvas * (1 - below)[..., None] + floor_color * below[..., None]
            # grid ticks on the floor so forward motion is visible even with
            # the tracking camera (1 m period)
            world_x = (self._xx - self.size / 2.0) / self._scale + cam_x
            tick = jnp.clip(
                1.5 - jnp.abs((world_x % 1.0) - 0.5) * self._scale, 0.0, 1.0
            ) * below
            canvas = canvas * (1 - tick)[..., None] + jnp.array(
                [120.0, 110.0, 95.0]
            ) * tick[..., None]
            for i, b in enumerate(model.geom_body):
                R = _rot(th[b])
                a = self._to_screen(pos[b] + R @ model.geom_a[i], cam_x)
                c = self._to_screen(pos[b] + R @ model.geom_b[i], cam_x)
                half = jnp.maximum(model.geom_radius[i] * self._scale, 1.2) + 0.5
                alpha = jnp.clip(
                    half - _segment_distance(self._yy, self._xx, a, c),
                    0.0, 1.0,
                )
                color = _BODY_PALETTE[b % len(_BODY_PALETTE)]
                canvas = canvas * (1 - alpha)[..., None] + color * alpha[..., None]
            return jnp.moveaxis(canvas, -1, 0).astype(jnp.uint8)

        def _render_state(self, state: EnvState) -> jnp.ndarray:
            return self.render_frame(state.physics[: self.nq])

    _PlanarPixels.__name__ = env_name.replace("-v4", "PlanarPixels")
    return _PlanarPixels()


def make_rigid3d_pixels(env_name: str, size: int = 84, frame_stack: int = 3):
    """Pixel variant of a 3D task (Ant/Humanoid family, envs/rigid3d.py):
    a perspective pinhole camera tracking the torso (MuJoCo 'trackcom'
    style), each capsule/sphere geom projected and composited back-to-front
    (painter's algorithm over the static geom set, ordered per frame by
    camera depth), and a ray-cast ground checkerboard so ego-motion is
    visible under the tracking camera. All inside the jitted program — the
    3D sibling of ``make_planar_pixels``; the reference's only pixel path is
    host MuJoCo rendering (reference envs/pixel_wrappers.py:101-204).

    Registered names: ``Ant3DPixels-v0`` / ``Humanoid3DPixels-v0``
    (envs/jax_envs.make_jax_env).
    """
    from .rigid3d import Rigid3DEnv, forward_kinematics

    class _Rigid3DPixels(PixelStackMixin, Rigid3DEnv):
        def __init__(self):
            super().__init__(env_name)
            self._init_raster(size, frame_stack)
            # trackcom-style camera: fixed world-axes offset from the torso,
            # looking at it. Ant: distance ~4 like the Gymnasium viewer;
            # humanoid family: closer, so the ~1.5 m figure fills the frame.
            if self.spec.full_body_obs or self.spec.standup:
                self._cam_offset = jnp.array([-1.6, -1.6, 0.8])
                self._look_offset = jnp.array([0.0, 0.0, -0.25])
            else:
                self._cam_offset = jnp.array([-2.4, -2.4, 1.7])
                self._look_offset = jnp.array([0.0, 0.0, 0.0])
            # pinhole focal length: ~45 deg vertical FOV
            self._focal = (size / 2.0) / jnp.tan(jnp.deg2rad(45.0) / 2.0)
            self._floor_a = jnp.array([214.0, 206.0, 188.0])
            self._floor_b = jnp.array([176.0, 168.0, 150.0])
            self._sky = jnp.array([250.0, 250.0, 255.0])

        def render_frame(self, qpos: jnp.ndarray) -> jnp.ndarray:
            model = self.model
            pos, rot = forward_kinematics(model, qpos)
            torso = pos[1]
            cam = torso + self._cam_offset
            # camera basis: z forward (toward torso), y down, x right
            fwd = torso + self._look_offset - cam
            fwd = fwd / jnp.linalg.norm(fwd)
            up = jnp.array([0.0, 0.0, 1.0])
            right = jnp.cross(fwd, up)
            right = right / jnp.linalg.norm(right)
            down = jnp.cross(fwd, right)  # right-handed: screen y grows down
            rc = jnp.stack([right, down, fwd])  # world->cam rows

            half = self.size / 2.0

            def to_cam(p):
                return rc @ (p - cam)

            def project(pc):
                z = jnp.maximum(pc[2], 0.3)  # clamp behind-camera points
                return half + self._focal * pc[:2] / z

            # ---- ground: per-pixel ray cast to z=0, checker in world xy
            dirs = jnp.stack(
                [
                    (self._xx - half) / self._focal,
                    (self._yy - half) / self._focal,
                    jnp.ones_like(self._xx),
                ],
                axis=-1,
            )  # (H, W, 3) in camera coords
            dirs_w = jnp.einsum("ij,hwj->hwi", rc.T, dirs)
            dz = dirs_w[..., 2]
            t_hit = -cam[2] / jnp.where(dz < -1e-6, dz, -1e-6)
            hit = (dz < -1e-6) & (t_hit > 0.0)
            gx = cam[0] + t_hit * dirs_w[..., 0]
            gy = cam[1] + t_hit * dirs_w[..., 1]
            checker = jnp.mod(jnp.floor(gx) + jnp.floor(gy), 2.0)
            ground = (
                self._floor_a[None, None, :] * (1 - checker)[..., None]
                + self._floor_b[None, None, :] * checker[..., None]
            )
            # fade distant ground toward the sky for a depth cue
            fade = jnp.clip(t_hit / 40.0, 0.0, 1.0)[..., None]
            ground = ground * (1 - fade) + self._sky[None, None, :] * fade
            canvas = jnp.where(
                hit[..., None], ground, self._sky[None, None, :]
            )

            # ---- geoms: project segments, composite far-to-near
            a_w = pos[model.rg_body] + jnp.einsum(
                "gij,gj->gi", rot[model.rg_body], model.rg_a
            )
            b_w = pos[model.rg_body] + jnp.einsum(
                "gij,gj->gi", rot[model.rg_body], model.rg_b
            )
            a_c = jax.vmap(to_cam)(a_w)
            b_c = jax.vmap(to_cam)(b_w)
            pa = jax.vmap(project)(a_c)
            pb = jax.vmap(project)(b_c)
            z_mid = jnp.maximum(0.5 * (a_c[:, 2] + b_c[:, 2]), 0.3)
            r_px = jnp.maximum(
                model.rg_radius * self._focal / z_mid, 1.2
            )

            def geom_alpha(p0, p1, rr):
                return jnp.clip(
                    rr + 0.5 - _segment_distance(self._yy, self._xx, p0, p1),
                    0.0,
                    1.0,
                )

            alphas = jax.vmap(geom_alpha)(pa, pb, r_px)  # (ng, H, W)
            colors = _BODY_PALETTE[
                jnp.asarray(model.rg_body) % len(_BODY_PALETTE)
            ]  # (ng, 3)
            order = jnp.argsort(-z_mid)  # far first

            def composite(canvas, g):
                al = alphas[g][..., None]
                return canvas * (1 - al) + colors[g][None, None, :] * al, None

            canvas, _ = jax.lax.scan(composite, canvas, order)
            return jnp.moveaxis(canvas, -1, 0).astype(jnp.uint8)

        def _render_state(self, state: EnvState) -> jnp.ndarray:
            return self.render_frame(state.physics[: self.nq])

    _Rigid3DPixels.__name__ = env_name.replace("-v4", "3DPixels")
    return _Rigid3DPixels()
