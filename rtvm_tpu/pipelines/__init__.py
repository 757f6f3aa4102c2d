from rtvm_tpu.pipelines.mosaic_pipeline import main, run_mosaic  # noqa: F401
