from tpu2dgs.core import cameras, sh, transforms  # noqa: F401
