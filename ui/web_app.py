"""Web UI for the mosaic pipeline (counterpart of reference web_app.py).

Flask is unavailable in this environment, so this uses the stdlib http.server with
the same route surface: POST /upload, POST /start, GET /progress, GET /results,
plus static assets. Unlike the reference — which scraped the stdout of a
subprocess for a pattern it never printed (web_app.py:36-47, a bug noted in
SURVEY.md section 1) — progress is reported in-process through the pipeline's
update_callback, so the progress bar actually works.
"""

from __future__ import annotations

import io
import json
import os
import threading
import urllib.parse
from http.server import HTTPServer, SimpleHTTPRequestHandler

ROOT = os.path.dirname(os.path.abspath(__file__))
UPLOADS = os.path.join(os.getcwd(), "uploads")
RESULTS = os.path.join(os.getcwd(), "results")

progress_status = {"state": "idle", "frame": 0, "percent": 0.0, "error": None}
_lock = threading.Lock()
_current_video = {"path": None}


def _run_pipeline(video_path: str):
    global progress_status
    try:
        from rtvm_tpu.pipelines.mosaic_pipeline import main

        def cb(frame_count, mosaic, pct):
            with _lock:
                progress_status.update(state="running", frame=frame_count, percent=pct)

        with _lock:
            progress_status.update(state="running", frame=0, percent=0.0, error=None)
        main(video_path, update_callback=cb, show_intermediate=False, output_dir=RESULTS)
        with _lock:
            progress_status.update(state="done", percent=100.0)
    except Exception as e:
        with _lock:
            progress_status.update(state="error", error=str(e))


class Handler(SimpleHTTPRequestHandler):
    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _file(self, path, ctype=None):
        if not os.path.exists(path):
            self.send_error(404)
            return
        with open(path, "rb") as f:
            body = f.read()
        self.send_response(200)
        if ctype:
            self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        p = urllib.parse.urlparse(self.path).path
        if p in ("/", "/index.html"):
            self._file(os.path.join(ROOT, "templates", "index.html"), "text/html")
        elif p.startswith("/static/"):
            self._file(os.path.join(ROOT, p.lstrip("/")))
        elif p == "/progress":
            with _lock:
                self._json(dict(progress_status))
        elif p == "/results":
            files = {}
            if os.path.isdir(RESULTS):
                for base, _, names in os.walk(RESULTS):
                    for n in names:
                        if n.lower().endswith((".jpg", ".png")):
                            rel = os.path.relpath(os.path.join(base, n), RESULTS)
                            files[rel] = f"/results-files/{rel}"
            self._json({"files": files})
        elif p.startswith("/results-files/"):
            rel = os.path.normpath(p[len("/results-files/"):])
            if rel.startswith(".."):
                self.send_error(403)
                return
            self._file(os.path.join(RESULTS, rel))
        else:
            self.send_error(404)

    def do_POST(self):
        p = urllib.parse.urlparse(self.path).path
        if p == "/upload":
            length = int(self.headers.get("Content-Length", 0))
            ctype = self.headers.get("Content-Type", "")
            data = self.rfile.read(length)
            os.makedirs(UPLOADS, exist_ok=True)
            # minimal multipart parse: find the file part's payload
            if "multipart/form-data" in ctype and b"\r\n\r\n" in data:
                boundary = ctype.split("boundary=")[-1].encode()
                parts = data.split(b"--" + boundary)
                payload, fname = None, "upload.mp4"
                for part in parts:
                    if b"filename=" in part:
                        head, _, body = part.partition(b"\r\n\r\n")
                        fname = head.split(b'filename="')[1].split(b'"')[0].decode() or fname
                        payload = body.rstrip(b"\r\n")
                if payload is None:
                    self._json({"error": "no file"}, 400)
                    return
                dest = os.path.join(UPLOADS, os.path.basename(fname))
                with open(dest, "wb") as f:
                    f.write(payload)
            else:
                dest = os.path.join(UPLOADS, "upload.mp4")
                with open(dest, "wb") as f:
                    f.write(data)
            _current_video["path"] = dest
            self._json({"ok": True, "path": os.path.basename(dest)})
        elif p == "/start":
            if not _current_video["path"]:
                self._json({"error": "upload a video first"}, 400)
                return
            threading.Thread(
                target=_run_pipeline, args=(_current_video["path"],), daemon=True
            ).start()
            self._json({"ok": True})
        else:
            self.send_error(404)

    def log_message(self, fmt, *args):  # quiet
        pass


def main(host: str = "127.0.0.1", port: int = 5000):
    srv = HTTPServer((host, port), Handler)
    print(f"Веб-интерфейс: http://{host}:{port}/")
    srv.serve_forever()


if __name__ == "__main__":
    main()
