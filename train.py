#!/usr/bin/env python
"""Training entry point (thin shim; see active_inference_diffusion_tpu/cli.py).

Kept at the repo root to mirror the reference's examples/train_mujoco.py usage
(reference: examples/train_mujoco.py:443-473); the installed console script is
``aid-tpu-train`` (pyproject.toml), pointing at the packaged module so the
wheel does not ship a generic top-level ``train`` module.
"""

from active_inference_diffusion_tpu.cli import build_configs, main  # noqa: F401

if __name__ == "__main__":
    main()
