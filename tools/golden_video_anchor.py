#!/usr/bin/env python3
"""Golden oracle for the W13 video-timestamp anchor (VideoAnchor.scala).

Replicates the reference semantics independently in pandas — nearest-ts_pst
anchor row (first minimum), then video_ts_anchor = vid_time +
(pos - anchor_pos) * 100 ms formatted HH:MM:SS.t with divmod semantics —
over the shipped ride-101 processed fixture, and writes
src/test/resources/golden_video_anchor.csv with (sample_idx,
video_ts_anchor) for the spec to compare.

Usage: python3 tools/golden_video_anchor.py
"""
import pandas as pd

FIXTURE = ("/root/reference/Sample_VESC_Logs_pipeline_testing/"
           "ride log 101/2025-09-30_11-07-12_processed.parquet")
VID_TIME = "00:00:30.7"
LOG_TIME = "2025-09-30 11:07:17.5"
OUT = "src/test/resources/golden_video_anchor.csv"


def format_video_ts(td):
    secs = td.total_seconds()
    h = int(secs // 3600)
    m = int((secs % 3600) // 60)
    s = secs % 60
    return f"{h:02d}:{m:02d}:{s:04.1f}"


def main():
    df = pd.read_parquet(FIXTURE).sort_values("sample_idx").reset_index(drop=True)
    df["ts_pst"] = pd.to_datetime(df["ts_pst"], errors="coerce")
    target = pd.to_datetime(LOG_TIME)
    closest_idx = (df["ts_pst"] - target).abs().idxmin()
    start_pos = df.index.get_loc(closest_idx)
    base = pd.to_timedelta(VID_TIME)
    out = []
    for i in range(len(df)):
        out.append(format_video_ts(base + pd.to_timedelta((i - start_pos) * 100, unit="ms")))
    res = pd.DataFrame({"sample_idx": df["sample_idx"].astype("int64"),
                        "video_ts_anchor": out})
    res.to_csv(OUT, index=False)
    print(f"anchor start_pos={start_pos}; wrote {len(res)} rows to {OUT}")


if __name__ == "__main__":
    main()
