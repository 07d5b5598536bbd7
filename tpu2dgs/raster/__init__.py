from tpu2dgs.raster.api import RasterSettings, render  # noqa: F401
