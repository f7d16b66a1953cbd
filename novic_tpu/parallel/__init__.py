from novic_tpu.parallel.mesh import create_mesh, dp_shardings  # noqa: F401
