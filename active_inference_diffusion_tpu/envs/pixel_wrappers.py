"""Pixel observation wrappers for MuJoCo environments.

Counterparts of the reference's pixel wrappers
(reference: active_inference_diffusion/envs/pixel_wrappers.py:8-339), written
against modern Gymnasium MuJoCo envs only (no mujoco-py legacy path).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import gymnasium as gym
import numpy as np
from gymnasium.spaces import Box

from .wrappers import ActionRepeat


class MuJoCoPixelObservationWrapper(gym.ObservationWrapper):
    """State -> rendered-pixel observations
    (reference: envs/pixel_wrappers.py:8-223). Keeps the state observation in
    ``info['state_obs']``."""

    def __init__(
        self,
        env: gym.Env,
        width: int = 84,
        height: int = 84,
        camera_name: Optional[str] = None,
        frame_skip: int = 1,
        channels_first: bool = True,
        normalize: bool = False,
    ):
        super().__init__(env)
        self.width = width
        self.height = height
        self.camera_name = camera_name
        self.frame_skip = frame_skip
        self.channels_first = channels_first
        self.normalize = normalize
        self._frame_count = 0
        self._last_pixels: Optional[np.ndarray] = None

        base = env.unwrapped
        if hasattr(base, "mujoco_renderer") and base.mujoco_renderer is not None:
            renderer = base.mujoco_renderer
            if hasattr(renderer, "width"):
                renderer.width = width
            if hasattr(renderer, "height"):
                renderer.height = height
            if camera_name is not None and hasattr(renderer, "camera_name"):
                renderer.camera_name = camera_name

        shape = (3, height, width) if channels_first else (height, width, 3)
        dtype = np.float32 if normalize else np.uint8
        high = 1.0 if normalize else 255
        self.observation_space = Box(low=0, high=high, shape=shape, dtype=dtype)
        self._original_obs_space = env.observation_space

    def _render_pixels(self) -> np.ndarray:
        pixels = self.env.unwrapped.render()
        if pixels is None:
            raise RuntimeError(
                "Environment returned no pixels; create it with "
                "render_mode='rgb_array'"
            )
        if pixels.shape[0] != self.height or pixels.shape[1] != self.width:
            from PIL import Image

            img = Image.fromarray(pixels.astype(np.uint8))
            img = img.resize((self.width, self.height), Image.Resampling.LANCZOS)
            pixels = np.array(img)
        if self.channels_first and pixels.shape[-1] == 3:
            pixels = np.transpose(pixels, (2, 0, 1))
        if self.normalize:
            return pixels.astype(np.float32) / 255.0
        return pixels.astype(np.uint8)

    def observation(self, obs: np.ndarray) -> np.ndarray:
        self._frame_count += 1
        if self.frame_skip > 1 and self._frame_count % self.frame_skip != 0:
            if self._last_pixels is not None:
                return self._last_pixels
        self._last_pixels = self._render_pixels()
        return self._last_pixels

    def reset(self, **kwargs) -> Tuple[np.ndarray, Dict[str, Any]]:
        obs, info = self.env.reset(**kwargs)
        self._frame_count = 0
        self._last_pixels = None
        info["state_obs"] = obs
        return self.observation(obs), info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        info["state_obs"] = obs
        return self.observation(obs), reward, terminated, truncated, info


class MuJoCoPixelDictObservationWrapper(MuJoCoPixelObservationWrapper):
    """Pixels + state dict observations
    (reference: envs/pixel_wrappers.py:226-250)."""

    def __init__(self, env, state_key: str = "state", pixel_key: str = "pixels", **kw):
        self.state_key = state_key
        self.pixel_key = pixel_key
        super().__init__(env, **kw)
        self.observation_space = gym.spaces.Dict(
            {self.pixel_key: self.observation_space, self.state_key: self._original_obs_space}
        )

    def observation(self, obs):
        return {self.pixel_key: super().observation(obs), self.state_key: obs}


class MultiCameraWrapper(gym.ObservationWrapper):
    """Simultaneous multi-camera views (reference: envs/pixel_wrappers.py:253-301)."""

    def __init__(
        self,
        env: gym.Env,
        camera_configs: Dict[str, Dict[str, Any]],
        channels_first: bool = True,
        normalize: bool = False,
    ):
        super().__init__(env)
        self.camera_configs = camera_configs
        self.channels_first = channels_first
        self.normalize = normalize
        spaces = {}
        for cam_name, cfg in camera_configs.items():
            shape = (
                (3, cfg["height"], cfg["width"])
                if channels_first
                else (cfg["height"], cfg["width"], 3)
            )
            dtype = np.float32 if normalize else np.uint8
            spaces[cam_name] = Box(
                low=0, high=1.0 if normalize else 255, shape=shape, dtype=dtype
            )
        self.observation_space = gym.spaces.Dict(spaces)
        self._wrappers = {
            cam: MuJoCoPixelObservationWrapper(
                env,
                width=cfg["width"],
                height=cfg["height"],
                camera_name=cam,
                channels_first=channels_first,
                normalize=normalize,
            )
            for cam, cfg in camera_configs.items()
        }

    def observation(self, obs):
        return {cam: w._render_pixels() for cam, w in self._wrappers.items()}


def make_pixel_mujoco(
    env_id: str,
    width: int = 84,
    height: int = 84,
    frame_stack: int = 3,
    action_repeat: int = 2,
    camera_name: Optional[str] = None,
    seed: Optional[int] = None,
    **kwargs,
) -> gym.Env:
    """Pixel-based MuJoCo env factory: gym.make(render_mode='rgb_array') ->
    ActionRepeat -> pixel wrapper -> FrameStackObservation
    (reference: envs/pixel_wrappers.py:306-339)."""
    env = gym.make(env_id, render_mode="rgb_array")
    if seed is not None:
        env.reset(seed=seed)
        env.action_space.seed(seed)
    if action_repeat > 1:
        env = ActionRepeat(env, repeat=action_repeat)
    env = MuJoCoPixelObservationWrapper(
        env, width=width, height=height, camera_name=camera_name, **kwargs
    )
    if frame_stack > 1:
        env = gym.wrappers.FrameStackObservation(env, frame_stack)
    return env
