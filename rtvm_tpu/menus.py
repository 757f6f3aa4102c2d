"""Interactive text menus — parity with the reference's input()-driven UIs
(slam.py main_menu:1620-1710, run_soil_analyzer:1428-1617, depth_to_3d.py
main:1178-1396). All actions delegate to the same code paths as the scriptable CLI
subcommands; these menus exist for drop-in interactive use.
"""

from __future__ import annotations

import os

from rtvm_tpu.slam.runner import get_video_files

BANNER = """
==================================================
  rtvm_tpu — аэровидео: мозаика / SLAM / 3D / почва
==================================================
"""

LIBRARIES_INFO = """
Использумые технологии (замена стека из референса):
  JAX/XLA (TPU)  — все вычислительные ядра (признаки, RANSAC, варп, LK, SGM, ICP)
  Flax           — YOLOv8 и сеть глубины
  OpenCV         — только декодирование видео и host-side контуры/калибровка
  C++ (native/)  — A* маршрутизация
  matplotlib     — 3D-просмотр (Open3D/Plotly при наличии)
"""


def _pick_video() -> str | None:
    vids = get_video_files()
    if not vids:
        path = input("Путь к видео: ").strip()
        return path or None
    for i, v in enumerate(vids, 1):
        print(f"  {i}. {os.path.basename(v)}")
    sel = input("Номер видео (или путь): ").strip()
    if sel.isdigit() and 1 <= int(sel) <= len(vids):
        return vids[int(sel) - 1]
    return sel or None


def slam_menu():
    while True:
        print("\n1. SLAM по видео\n2. SLAM с веб-камеры\n3. 3D-траектория\n4. Библиотеки\n5. Анализ почвы\n0. Выход")
        c = input("> ").strip()
        if c == "1":
            v = _pick_video()
            if v:
                from rtvm_tpu.slam.runner import run_slam_on_video

                run_slam_on_video(v)
        elif c == "2":
            from rtvm_tpu.slam.runner import run_slam_webcam

            run_slam_webcam()
        elif c == "3":
            p = input("Путь к slam_trajectory_final.npy [test_output/...]: ").strip() or \
                "test_output/slam_trajectory_final.npy"
            from rtvm_tpu.slam.runner import visualize_trajectory_3d

            print(visualize_trajectory_3d(p))
        elif c == "4":
            print(LIBRARIES_INFO)
        elif c == "5":
            soil_menu()
        elif c == "0":
            return


def soil_menu():
    from rtvm_tpu.slam.terrain import TerrainSoilAnalyzer

    analyzer = TerrainSoilAnalyzer()
    while True:
        print("\n1. Анализ файла\n2. Пакетный анализ каталога\n3. Справка о типах почв\n0. Назад")
        c = input("> ").strip()
        if c == "1":
            import cv2

            p = input("Путь к изображению: ").strip()
            img = cv2.imread(p)
            if img is None:
                print("не удалось открыть")
                continue
            res = analyzer.analyze_image(img)
            print(analyzer.report(res))
            out = os.path.join("test_output", f"soil_{os.path.basename(p)}")
            os.makedirs("test_output", exist_ok=True)
            cv2.imwrite(out, analyzer.visualize(img, res))
            print(f"Сохранено: {out}")
        elif c == "2":
            import cv2
            import glob

            d = input("Каталог: ").strip()
            for p in sorted(glob.glob(os.path.join(d, "*.jpg")) + glob.glob(os.path.join(d, "*.png"))):
                img = cv2.imread(p)
                if img is None:
                    continue
                res = analyzer.analyze_image(img)
                print(f"{os.path.basename(p)}: {res['soil_type']} ({res['confidence']:.2f})")
        elif c == "3":
            from rtvm_tpu.slam.terrain import SOIL_TYPES

            for name, pr in SOIL_TYPES.items():
                print(f"  {name}: плодородие {pr['fertility']}, pH {pr['ph']}, культуры: {', '.join(pr['crops'])}")
        elif c == "0":
            return


def synthetic_depth_test(output_path: str = "test_image.jpg"):
    """Reference depth_to_3d.py:1270-1282 menu option 3: build the synthetic
    3-shape test image (two rectangles + circle) and run the single-image
    pipeline on it."""
    import cv2
    import numpy as np

    from rtvm_tpu.depth3d.pipeline import process_single_image

    test_img = np.zeros((480, 640, 3), dtype=np.uint8)
    cv2.rectangle(test_img, (100, 100), (300, 300), (0, 0, 255), -1)
    cv2.rectangle(test_img, (350, 150), (550, 350), (0, 255, 0), -1)
    cv2.circle(test_img, (320, 400), 60, (255, 0, 0), -1)
    cv2.imwrite(output_path, test_img)
    print("Создание тестового изображения...")
    out_dir = os.path.dirname(os.path.abspath(output_path))
    return process_single_image(output_path, output_dir=out_dir)


def depth3d_menu():
    while True:
        print("\n1. Видео -> 3D\n2. Изображение -> 3D\n3. Тест на синтетическом изображении\n"
              "4. Один кадр видео -> 3D\n5. Мульти-вью -> 3D\n0. Выход")
        c = input("> ").strip()
        from rtvm_tpu.depth3d.pipeline import (
            process_multiple_images_to_3d,
            process_single_image,
            process_video_to_3d_model,
        )

        if c == "1":
            v = _pick_video()
            if v:
                process_video_to_3d_model(v)
        elif c == "2":
            p = input("Путь к изображению: ").strip()
            process_single_image(p)
        elif c == "3":
            synthetic_depth_test()
        elif c == "4":
            v = _pick_video()
            if v:
                process_video_to_3d_model(v, single_frame=True)
        elif c == "5":
            d = input("Каталог изображений: ").strip()
            import glob

            paths = sorted(glob.glob(os.path.join(d, "*.jpg")) + glob.glob(os.path.join(d, "*.png")))
            mode = input("Режим углов (auto/uniform/manual) [auto]: ").strip() or "auto"
            process_multiple_images_to_3d(paths, angle_mode=mode)
        elif c == "0":
            return


def viewer_menu():
    """3D-file viewer menu with backend choice (reference
    visualize_pointcloud.py:319-408: matplotlib / Open3D window / offscreen /
    PyVista — here matplotlib / jitted offscreen rasterizer / interactive
    HTML / side-by-side)."""
    from rtvm_tpu.viz.pointcloud_viewer import scan_and_describe

    d = input("Каталог с .ply/.obj [.]: ").strip() or "."
    files = scan_and_describe(d)
    if not files:
        print("Файлы .ply/.obj не найдены")
        return
    for i, f in enumerate(files, 1):
        extra = f" ({f['vertices']} вершин, {f['faces']} граней)" if "vertices" in f else ""
        print(f"{i}. [{f['kind']}] {f['path']}{extra}")
    try:
        pick = files[int(input("Файл: ").strip()) - 1]["path"]
    except (ValueError, IndexError):
        return
    print("1. matplotlib PNG\n2. Оффскрин-рендер 1920x1080 (z-buffer)\n3. Интерактивный HTML\n4. Облако+меш рядом (HTML)")
    b = input("> ").strip()
    from rtvm_tpu.viz import pointcloud_viewer as pv

    if b == "1":
        out = (pv.view_mesh_matplotlib if pick.endswith(".obj") else pv.view_matplotlib)(pick)
    elif b == "2":
        out = pv.view_offscreen(pick)
    elif b == "3":
        out = (pv.view_mesh_interactive if pick.endswith(".obj") else pv.view_interactive)(pick)
    elif b == "4":
        other = input("Путь к .obj мешу: ").strip()
        out = pv.view_side_by_side(pick, other)
    else:
        return
    print(f"Сохранено: {out}")


def main_menu():
    print(BANNER)
    while True:
        print("\n1. Мозаика из видео\n2. SLAM-меню\n3. 3D-реконструкция\n4. Анализ почвы\n5. Просмотр 3D-файлов\n0. Выход")
        c = input("> ").strip()
        if c == "1":
            v = _pick_video()
            if v:
                from rtvm_tpu.pipelines.mosaic_pipeline import main as run

                run(v)
        elif c == "2":
            slam_menu()
        elif c == "3":
            depth3d_menu()
        elif c == "4":
            soil_menu()
        elif c == "5":
            viewer_menu()
        elif c == "0":
            return


if __name__ == "__main__":
    main_menu()
