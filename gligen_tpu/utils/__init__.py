from gligen_tpu.utils.registry import Registry, instantiate  # noqa: F401
