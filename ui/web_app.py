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

def _inside(base: str, path: str) -> bool:
    """True iff `path` resolves to a location inside `base` (no traversal/symlink
    escape): both sides go through realpath before the containment check."""
    base_r = os.path.realpath(base)
    path_r = os.path.realpath(path)
    try:
        return os.path.commonpath([base_r, path_r]) == base_r
    except ValueError:  # different drives (win32)
        return False


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

    def _file(self, path, ctype=None, base=None):
        if base is not None and not _inside(base, path):
            self.send_error(403)
            return
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
            static_root = os.path.join(ROOT, "static")
            self._file(
                os.path.join(static_root, p[len("/static/"):]), base=static_root
            )
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
            rel = p[len("/results-files/"):].lstrip("/")
            self._file(os.path.join(RESULTS, rel), base=RESULTS)
        else:
            self.send_error(404)

    def do_POST(self):
        p = urllib.parse.urlparse(self.path).path
        if p == "/upload":
            length = int(self.headers.get("Content-Length", 0))
            ctype = self.headers.get("Content-Type", "")
            os.makedirs(UPLOADS, exist_ok=True)
            if "multipart/form-data" in ctype:
                dest = self._stream_multipart(length, ctype)
                if dest is None:
                    self._json({"error": "no file"}, 400)
                    return
            else:
                dest = os.path.join(UPLOADS, "upload.mp4")
                with open(dest, "wb") as f:
                    remaining = length
                    while remaining > 0:
                        chunk = self.rfile.read(min(1 << 20, remaining))
                        if not chunk:
                            break
                        f.write(chunk)
                        remaining -= len(chunk)
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

    def _stream_multipart(self, length: int, ctype: str):
        """Stream the file part of a multipart/form-data body to UPLOADS without
        buffering the whole body in RAM (large drone videos). Returns the dest path
        or None if no file part is present."""
        boundary = b"--" + ctype.split("boundary=")[-1].strip().encode()
        remaining = length

        def read(n):
            nonlocal remaining
            chunk = self.rfile.read(min(n, remaining))
            remaining -= len(chunk)
            return chunk

        # Accumulate until the file part's header block is complete.
        buf = b""
        while remaining > 0 and len(buf) < 1 << 20:
            buf += read(64 << 10)
            start = buf.find(b"filename=")
            if start != -1 and b"\r\n\r\n" in buf[start:]:
                break
        start = buf.find(b"filename=")
        if start == -1:
            return None
        head_end = buf.index(b"\r\n\r\n", start) + 4
        try:
            fname = buf[start:].split(b'"', 2)[1].decode() or "upload.mp4"
        except (IndexError, UnicodeDecodeError):
            fname = "upload.mp4"
        dest = os.path.join(UPLOADS, os.path.basename(fname))

        # Stream payload to disk, holding back a tail long enough to contain a
        # partially-received terminating b"\r\n--boundary".
        hold = len(boundary) + 4
        buf = buf[head_end:]
        with open(dest, "wb") as f:
            while True:
                end = buf.find(b"\r\n" + boundary)
                if end != -1:
                    f.write(buf[:end])
                    break
                if remaining <= 0:
                    f.write(buf)  # unterminated body: keep what we got
                    break
                if len(buf) > hold:
                    f.write(buf[:-hold])
                    buf = buf[-hold:]
                buf += read(1 << 20)
        while remaining > 0:  # drain the rest of the request
            read(1 << 20)
        return dest

    def log_message(self, fmt, *args):  # quiet
        pass


def main(host: str = "127.0.0.1", port: int = 5000):
    srv = HTTPServer((host, port), Handler)
    print(f"Веб-интерфейс: http://{host}:{port}/")
    srv.serve_forever()


if __name__ == "__main__":
    main()
