"""Generate the round-3 artifact gallery (artifacts/round3/) — the
human-checkable evidence round-2 VERDICT item 7 asked for.

Contents:
  mosaic_full_clip.jpg        full 592-frame mosaic (fused single-dispatch path)
  mosaic_detections.jpg       trained YOLOv8n-aerial detections on the mosaic
  navigation_map.jpg          obstacle masks + A* routes from those detections
  world_detections.jpg        open-vocab head on the mosaic (if checkpoint)
  depthnet_frame_panel.jpg    trained DepthNet depth on a real frame
  tsdf_mesh_view.png          TSDF-fused + marching-tetrahedra mesh render
  terrain_cloud_interactive.html  self-contained 3D viewer (viz/html3d.py)

Run on the TPU:  python tools/make_artifacts_r3.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts", "round3"
)


def main():
    import cv2
    import jax

    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()
    os.makedirs(OUT, exist_ok=True)

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.pipelines.mosaic_pipeline import run_mosaic
    from rtvm_tpu.utils.image import crop_black_areas

    # 1. full-clip mosaic via the fused single-dispatch path (skipped when the
    # artifact already exists so a crashed run resumes from where it stopped)
    mosaic_path = os.path.join(OUT, "mosaic_full_clip.jpg")
    if os.path.exists(mosaic_path):
        img = cv2.imread(mosaic_path)
        print("mosaic: reusing existing", mosaic_path, flush=True)
    else:
        mosaic, stats = run_mosaic(
            VIDEO, config=MosaicConfig(window_size=16), detector_type="orb", fused=True
        )
        img = crop_black_areas(mosaic.output_img_u8, threshold=80, margin=30)
        cv2.imwrite(mosaic_path, img)
        print("mosaic:", stats, flush=True)

    # 2. trained-detector detections on the mosaic + navigation map
    from rtvm_tpu.detect.detector import ObjectDetector
    from rtvm_tpu.navigate.mapping import analyze_for_navigation

    det = ObjectDetector()
    if not os.path.exists(os.path.join(OUT, "navigation_map.jpg")):
        dets = det.detect_objects(img)
        print(f"detections: {len(dets)}", {d["class"] for d in dets}, flush=True)
        cv2.imwrite(os.path.join(OUT, "mosaic_detections.jpg"), det.draw_detections(img, dets))
        nav = analyze_for_navigation(img, dets)
        cv2.imwrite(os.path.join(OUT, "navigation_map.jpg"), nav)

    # 3. open-vocab world detections (now at honored imgsz, round-3 fix)
    if os.path.exists(os.path.join(OUT, "world_detections.jpg")):
        pass
    elif det.model_world is not None and getattr(det.model_world, "is_open_vocab", False):
        w = det.model_world
        w.set_classes(["car", "building", "person"])
        dets_w = w.predict(img, conf=0.25, imgsz=640)
        cv2.imwrite(
            os.path.join(OUT, "world_detections.jpg"), det.draw_detections(img, dets_w)
        )
        print("world detections:", len(dets_w), flush=True)

    # 4. trained DepthNet on a real frame + point cloud + TSDF mesh + viewer
    cap = cv2.VideoCapture(VIDEO)
    _, fr = cap.read()
    cap.release()
    from rtvm_tpu.depth3d.estimator import MonocularDepthEstimator

    est = MonocularDepthEstimator(prefer_hub=False)
    d = est.estimate_depth(fr)
    panel = np.concatenate(
        [fr, cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_PLASMA)], axis=1
    )
    cv2.imwrite(os.path.join(OUT, "depthnet_frame_panel.jpg"), panel)
    print("depth backend:", est.backend, flush=True)

    from rtvm_tpu.depth3d.pointcloud import unproject_depth
    from rtvm_tpu.depth3d.tsdf import fuse_tsdf, make_tsdf, tsdf_mesh
    from rtvm_tpu.viz.html3d import write_cloud_html
    from rtvm_tpu.viz.pointcloud_viewer import view_mesh_matplotlib
    from rtvm_tpu.io.ply import write_obj_mesh

    # reference create_point_cloud_manual counterpart (depth_to_3d.py:292-345)
    pts, cols = unproject_depth(d, fr, depth_scale=5.0, stride=3)
    write_cloud_html(pts, cols, os.path.join(OUT, "terrain_cloud_interactive.html"),
                     title="frame 0 depth cloud")

    h, w = d.shape
    K = np.array([[max(h, w), 0, w / 2], [0, max(h, w), h / 2], [0, 0, 1]], np.float32)
    depth_m = (1.0 - d) * 5.0
    lo, hi = pts.min(0), pts.max(0)
    size = float((hi - lo).max()) * 1.15 + 1e-3
    vol = make_tsdf(origin=lo - 0.075 * size, size=size, grid=96)
    vol = fuse_tsdf(vol, depth_m[None], K, np.eye(4, dtype=np.float32)[None])
    verts, faces = tsdf_mesh(vol)
    if len(faces):
        obj = os.path.join(OUT, "tsdf_mesh.obj")
        write_obj_mesh(obj, verts, faces)
        view_mesh_matplotlib(obj, os.path.join(OUT, "tsdf_mesh_view.png"))
        print(f"tsdf mesh: {len(verts)} verts {len(faces)} faces", flush=True)

    print("artifacts written to", OUT)


if __name__ == "__main__":
    main()
