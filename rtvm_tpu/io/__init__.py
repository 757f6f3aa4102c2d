from rtvm_tpu.io.video import VideoReader, read_video_windows  # noqa: F401
