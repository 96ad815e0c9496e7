import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (matches the driver's dryrun environment).
# The axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon; backend
# selection is lazy, so forcing the env here (before any jax.devices() call)
# still lands the tests on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

# jax is pre-imported by the axon sitecustomize with jax_platforms=axon
# already captured from the env; update the config directly (backend
# selection is lazy, so this wins as long as no jax computation ran yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
