import os

# Force CPU for tests: the ambient axon sitecustomize registers the
# (tunneled, slow-to-compile) TPU backend and overrides JAX_PLATFORMS, so
# setting the env var is not enough — update the jax config directly.
# Tests validate semantics on an 8-device virtual CPU mesh; TPU execution
# is covered by bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
