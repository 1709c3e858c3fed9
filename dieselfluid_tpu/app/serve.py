"""Serve an output directory with the trajectory viewer.

    python -m dieselfluid_tpu.app.serve out/ [--port 8123]

Copies app/viewer.html into the directory and serves it over HTTP — the
working equivalent of the reference's Electron shell + HTML frontend
(ref: dslapp/app.go:27-34 serves resources/index.html over a TCP channel;
its sim-control handler was never wired, app.go:69-75). Here the data flow
is file-based: the CLI exports .dfc trajectories (--stream dfc), the
browser plays them back.
"""

from __future__ import annotations

import argparse
import functools
import http.server
import os
import shutil
import sys

VIEWER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "viewer.html")


def install_viewer(out_dir: str) -> str:
    """Copy viewer.html into `out_dir`; returns the installed path."""
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "viewer.html")
    shutil.copyfile(VIEWER, dst)
    return dst


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dieselfluid-serve", description=__doc__)
    p.add_argument("dir", nargs="?", default="out")
    p.add_argument("--port", type=int, default=8123)
    args = p.parse_args(argv)
    install_viewer(args.dir)
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=os.path.abspath(args.dir))
    with http.server.ThreadingHTTPServer(("127.0.0.1", args.port),
                                         handler) as srv:
        print(f"viewer: http://127.0.0.1:{args.port}/viewer.html "
              f"(serving {os.path.abspath(args.dir)})")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
