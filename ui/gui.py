"""Desktop GUI for the mosaic pipeline (counterpart of reference gui.py).

Plain tkinter (CustomTkinter is not available in this environment): select a video,
run the pipeline in a worker thread, marshal progress through a queue polled with
after(), live mosaic preview, and result panels loaded from the output directory —
the same thread/queue architecture as the reference (gui.py:77-158).
"""

from __future__ import annotations

import os
import queue
import threading
import tkinter as tk
from tkinter import filedialog, ttk

import numpy as np


class App:
    def __init__(self, root: tk.Tk):
        self.root = root
        root.title("Аэромозаика (rtvm_tpu)")
        root.geometry("900x640")
        self.queue: queue.Queue = queue.Queue()
        self.video_path: str | None = None
        self.worker: threading.Thread | None = None

        top = ttk.Frame(root); top.pack(fill="x", padx=8, pady=6)
        ttk.Button(top, text="Выбрать видео", command=self.select_video).pack(side="left")
        self.path_label = ttk.Label(top, text="видео не выбрано")
        self.path_label.pack(side="left", padx=8)
        self.run_btn = ttk.Button(top, text="Запустить обработку", command=self.run_processing, state="disabled")
        self.run_btn.pack(side="right")

        self.progress = ttk.Progressbar(root, maximum=100.0)
        self.progress.pack(fill="x", padx=8)
        self.status = ttk.Label(root, text="готов")
        self.status.pack(anchor="w", padx=8)

        self.preview = tk.Label(root, bg="#222")
        self.preview.pack(fill="both", expand=True, padx=8, pady=8)

        self.root.after(100, self.process_queue)

    # ------------------------------------------------------------------ events
    def select_video(self):
        p = filedialog.askopenfilename(filetypes=[("Video", "*.mp4 *.avi *.mov"), ("All", "*.*")])
        if p:
            self.video_path = p
            self.path_label.config(text=os.path.basename(p))
            self.run_btn.config(state="normal")

    def run_processing(self):
        if not self.video_path or (self.worker and self.worker.is_alive()):
            return
        self.run_btn.config(state="disabled")
        self.worker = threading.Thread(target=self._process_video, daemon=True)
        self.worker.start()

    def _process_video(self):
        try:
            from rtvm_tpu.pipelines.mosaic_pipeline import main

            def cb(frame_count, mosaic, pct):
                self.queue.put(("progress", frame_count, mosaic, pct))

            main(self.video_path, update_callback=cb, show_intermediate=False,
                 output_dir="results")
            self.queue.put(("done", "results"))
        except Exception as e:
            self.queue.put(("error", str(e)))

    # ------------------------------------------------------------- UI thread
    def process_queue(self):
        try:
            while True:
                msg = self.queue.get_nowait()
                if msg[0] == "progress":
                    _, n, mosaic, pct = msg
                    self.progress["value"] = pct
                    self.status.config(text=f"обработано кадров: {n} ({pct:.1f}%)")
                    self._show_image(mosaic)
                elif msg[0] == "done":
                    self.status.config(text=f"готово — результаты в {msg[1]}/")
                    self.run_btn.config(state="normal")
                    self._load_results(msg[1])
                elif msg[0] == "error":
                    self.status.config(text=f"ошибка: {msg[1]}")
                    self.run_btn.config(state="normal")
        except queue.Empty:
            pass
        self.root.after(100, self.process_queue)

    def _show_image(self, bgr: np.ndarray, max_size=(840, 480)):
        try:
            from PIL import Image, ImageTk

            img = Image.fromarray(bgr[..., ::-1])
            img.thumbnail(max_size)
            photo = ImageTk.PhotoImage(img)
            self.preview.config(image=photo)
            self.preview.image = photo
        except Exception:
            pass

    def _load_results(self, out_dir: str):
        import cv2

        p = os.path.join(out_dir, "navigation_map.jpg")
        if not os.path.exists(p):
            p = os.path.join(out_dir, "mosaic.jpg")
        if os.path.exists(p):
            self._show_image(cv2.imread(p))
        self._open_detection_popups(out_dir)

    def _open_detection_popups(self, out_dir: str, limit: int = 6):
        """Per-detection Toplevel windows for Detections/ images (reference
        gui.py:160-168 opens one popup per saved detection file)."""
        import glob

        import cv2

        det_dir = os.path.join(out_dir, "Detections")
        if not os.path.isdir(det_dir):
            return
        files = sorted(glob.glob(os.path.join(det_dir, "*.jpg")))[:limit]
        for f in files:
            try:
                from PIL import Image, ImageTk

                win = tk.Toplevel(self.root)
                win.title(os.path.basename(f))
                img = Image.fromarray(cv2.imread(f)[..., ::-1])
                img.thumbnail((520, 380))
                photo = ImageTk.PhotoImage(img)
                lbl = tk.Label(win, image=photo)
                lbl.image = photo
                lbl.pack()
            except Exception:
                continue


def main():
    root = tk.Tk()
    App(root)
    root.mainloop()


if __name__ == "__main__":
    main()
