import os

# Tests run on CPU with a virtual 8-device mesh: deterministic f32 math and
# multi-chip sharding logic without hardware. (The environment may preset
# JAX_PLATFORMS=axon/tpu; benchmarks use the real chip, tests do not.)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
