"""Result browser: serves an HTML gallery of rendered videos/images under
logdir/ and database/ (reference: browser/app.py, flask -> stdlib
http.server since flask isn't in this image).

  python browser/app.py [--port 8090] [--root .]
"""

from __future__ import annotations

import argparse
import glob
import html
import os
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

GALLERY_GLOBS = (
    "logdir/*/*.mp4",
    "logdir/*/*.gif",
    "logdir/*/renderings_*/*/*.mp4",
    "logdir/*/renderings_*/*/*.png",
    "database/processed/JPEGImages/Full-Resolution/*/00000.jpg",
)
PAGE_TMPL = """<!doctype html><html><head><title>lab4d-tpu results</title>
<style>
 body {{ font-family: sans-serif; background: #111; color: #eee; }}
 .grid {{ display: flex; flex-wrap: wrap; gap: 12px; }}
 .cell {{ width: 320px; }}
 .cell video, .cell img {{ width: 100%; border-radius: 6px; }}
 .cell .name {{ font-size: 12px; color: #9ad; word-break: break-all; }}
 h2 {{ color: #9ad; }}
</style></head><body>
<h2>lab4d-tpu result browser</h2>
<div class="grid">{cells}</div>
</body></html>"""


def build_index(root: str) -> str:
    cells = []
    for pattern in GALLERY_GLOBS:
        for path in sorted(glob.glob(os.path.join(root, pattern))):
            rel = os.path.relpath(path, root)
            esc = html.escape(rel)
            if rel.endswith(".mp4"):
                media = f'<video src="/{esc}" controls loop muted></video>'
            else:
                media = f'<img src="/{esc}">'
            cells.append(
                f'<div class="cell">{media}<div class="name">{esc}</div></div>'
            )
    if not cells:
        cells = ["<p>No results yet. Train something!</p>"]
    return PAGE_TMPL.format(cells="\n".join(cells))


class Handler(SimpleHTTPRequestHandler):
    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = build_index(os.getcwd()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            super().do_GET()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--root", default=".")
    args = ap.parse_args()
    os.chdir(args.root)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"browsing results at http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
