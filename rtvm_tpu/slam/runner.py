"""SLAM drivers (reference slam.py:466-744): run on video / webcam, trajectory save,
3D trajectory visualization (matplotlib backend — Open3D is gated/absent)."""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from rtvm_tpu.slam.vo import SimpleSLAM, default_camera_matrix


def get_video_files(data_dir: str = "/root/reference/Data") -> list:
    """Discover bundled clips (reference get_video_files, slam.py:466-476)."""
    vids = []
    for ext in ("*.mp4", "*.avi", "*.mov"):
        vids.extend(glob.glob(os.path.join(data_dir, ext)))
    return sorted(vids)


def run_slam_on_video(
    video_path: str,
    output_dir: str = "test_output",
    show: bool = False,
    max_frames: Optional[int] = None,
):
    """Process a video through SimpleSLAM, saving the trajectory as .npy + .txt
    (reference run_slam_on_video, slam.py:479-603 incl. the save format with header)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    ok, frame = cap.read()
    if not ok:
        raise ValueError(f"empty video: {video_path}")
    h, w = frame.shape[:2]
    slam = SimpleSLAM(default_camera_matrix(w, h))

    count = 0
    while True:
        slam.process_frame(frame)
        count += 1
        if count % 30 == 0:
            print(
                f"Кадр {count}: отслеживается {slam.vo.last_num_tracked}, "
                f"инлайеров {slam.vo.last_num_inliers}, ключевых кадров {len(slam.keyframes)}"
            )
        if show:
            overlay = slam.vo.draw_trajectory_overlay(frame)
            cv2.imshow("SLAM", overlay)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        if max_frames is not None and count >= max_frames:
            break
        ok, frame = cap.read()
        if not ok:
            break
    cap.release()

    os.makedirs(output_dir, exist_ok=True)
    traj = np.asarray(slam.vo.trajectory)
    np.save(os.path.join(output_dir, "slam_trajectory_final.npy"), traj)
    with open(os.path.join(output_dir, "slam_trajectory_final.txt"), "w") as f:
        f.write(f"# SLAM trajectory: {os.path.basename(video_path)}\n")
        f.write(f"# frames: {count}, keyframes: {len(slam.keyframes)}\n")
        f.write("# x y z\n")
        for p in traj:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
    print(f"Траектория сохранена: {output_dir}/slam_trajectory_final.npy ({len(traj)} точек)")
    return slam, traj


def run_slam_webcam(camera_id: int = 0, width: int = 640, height: int = 480):
    """Webcam SLAM loop with reset key (reference run_slam_webcam, slam.py:606-693)."""
    import cv2

    cap = cv2.VideoCapture(camera_id)
    cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open camera {camera_id}")
    slam = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if slam is None:
            h, w = frame.shape[:2]
            slam = SimpleSLAM(default_camera_matrix(w, h))
        slam.process_frame(frame)
        cv2.imshow("SLAM webcam", slam.vo.draw_trajectory_overlay(frame))
        k = cv2.waitKey(1) & 0xFF
        if k == ord("q"):
            break
        if k == ord("r"):
            slam = None
    cap.release()
    cv2.destroyAllWindows()


def visualize_trajectory_3d(npy_path: str, save_path: Optional[str] = None):
    """3D trajectory plot with start/end markers (reference visualize_trajectory_3d,
    slam.py:696-744 — Open3D line set replaced by a matplotlib backend since Open3D
    is not available in this environment)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traj = np.load(npy_path)
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot(traj[:, 0], traj[:, 1], traj[:, 2], "g-", linewidth=1)
    ax.scatter(*traj[0], color="blue", s=60, label="start")
    ax.scatter(*traj[-1], color="red", s=60, label="end")
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    ax.legend()
    out = save_path or npy_path.replace(".npy", "_3d.png")
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return out
