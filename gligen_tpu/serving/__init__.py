from gligen_tpu.serving.server import ServingSession, make_server  # noqa: F401
