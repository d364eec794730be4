"""Regenerate README's bench-derived performance rows from the latest
bench artifact so the table cannot drift from measured numbers (single
source of perf truth).

Round 5+: bench.py prints a COMPACT line (the driver's BENCH_r*.json
``parsed``) and writes the full payload to benchmarks/BENCH_full_r*.json
— this script prefers the full sidecar (it carries every throughput/
quality key), falling back to a driver artifact with a parsed full
payload (rounds <= 4 format).

Rows between the PERF:BENCH markers are rewritten from the artifact;
rows outside them are one-off measurements annotated with their source
script. Usage: python benchmarks/update_readme_perf.py [artifact.json]
"""

import glob
import json
import os
import re
import sys


def _round_no(path):
    m = re.search(r"BENCH(?:_full)?_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def latest_artifact():
    """Newest usable artifact by ROUND NUMBER (not lexicographic — r9
    must not outrank r10): full sidecars first, then old-format driver
    artifacts whose parsed payload carries the throughput keys."""
    for f in sorted(glob.glob("benchmarks/BENCH_full_r*.json")
                    + glob.glob("BENCH_r*.json"),
                    key=_round_no, reverse=True):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if "BENCH_full" in os.path.basename(f):
            return f
        if d.get("parsed") and "sgm_mpixdisp_per_s" in d["parsed"]:
            return f
    raise SystemExit("no usable bench artifact found")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else latest_artifact()
    data = json.load(open(path))
    p = data if "BENCH_full" in os.path.basename(path) else data["parsed"]

    v = p["value"]
    ratio = p["vs_baseline"]
    baseline = v / ratio  # Mpix*disp/s; single source: the artifact itself
    ms = 384 * 288 * 11 / (v * 1e6) * 1e3
    rows = [
        ("ASW dense disparity, Tsukuba 384×288, 11 candidates, win 35, "
         "consistent",
         f"**~{ms:.0f} ms** end-to-end incl. host readback "
         f"({v:.1f} Mpix·disp/s, {ratio:.1f}× reference; the L-R check "
         "costs ONE kernel pass — the right-reference cost volume is a "
         "lane-shift of the left one, so the reference's second full scan "
         "vanishes)",
         f"<1 s on 4 CPU threads (≈{baseline:.2f} Mpix·disp/s)"),
    ]
    if "asw_step2_mpixdisp_per_s" in p:
        v2 = p["asw_step2_mpixdisp_per_s"]
        rows.append((
            "Same, subsampled-window scan (`step=2` — the mode the "
            "reference proposed but never built)",
            f"**~{384*288*11/(v2*1e6)*1e3:.0f} ms** ({v2:.1f} Mpix·disp/s, "
            f"{v2/baseline:.1f}× reference) at bad-2.0 "
            f"{p.get('asw_step2_bad2_nonocc', 0)*100:.2f} % vs "
            f"{p.get('bad2_nonocc', 0)*100:.2f} % exact",
            '"40-50% faster" (projected only, passive.py:43-46)'))
    if "asw_batch8_mpixdisp_per_s" in p:
        vb = p["asw_batch8_mpixdisp_per_s"]
        rows.append((
            "Same, 8-frame batch (frame axis on the Pallas kernel grid)",
            f"**{vb:.1f} Mpix·disp/s/frame** ({vb/baseline:.1f}× reference) — "
            "per-dispatch tunnel latency amortized over the stack",
            "N/A (no batch API)"))
    bad_parts = []
    if "bad2_nonocc" in p:
        bad_parts.append(f"{p['bad2_nonocc']*100:.1f} % (ASW)")
    if "sgm_bad2_nonocc" in p:
        bad_parts.append(f"{p['sgm_bad2_nonocc']*100:.1f} % (SGM)")
    if "gsw_bad2_nonocc" in p:
        bad_parts.append(f"{p['gsw_bad2_nonocc']*100:.1f} % (GSW)")
    if bad_parts:
        rows.append(("Tsukuba bad-2.0 (non-occluded)",
                     ", ".join(bad_parts),
                     "ASW golden output shipped in-repo"))
    if "sgm_mpixdisp_per_s" in p:
        s1 = p["sgm_mpixdisp_per_s"]
        cell = (f"**{s1:.0f} Mpix·disp/s** single-frame (census cost, "
                "tuned point)")
        if "sgm_bt_mpixdisp_per_s" in p:
            cell += (f", {p['sgm_bt_mpixdisp_per_s']:.0f} at the cheaper "
                     "BT point")
        if "sgm_batch8_mpixdisp_per_s" in p:
            cell += (f", **{p['sgm_batch8_mpixdisp_per_s']:.0f}"
                     " Mpix·disp/s/frame** batched (dispatch-dominated "
                     "at this frame size; see `sgm_pallas.py`)")
        rows.append(("SGM dense disparity, Tsukuba, 16 candidates",
                     cell, "delegated to OpenCV (`cv2.StereoSGBM`)"))
    if "asw_720p_mpixdisp_per_s" in p:
        cell = (f"**{p['asw_720p_ms']:.0f} ms** "
                f"({p['asw_720p_mpixdisp_per_s']:.0f} Mpix·disp/s) — "
                "driver-captured every round since r5")
        if "sgm_720p_mpixdisp_per_s" in p:
            cell += (f"; SGM D=128 Pallas **{p['sgm_720p_ms']:.0f} ms** "
                     f"({p['sgm_720p_mpixdisp_per_s']:.0f} Mpix·disp/s)")
        rows.append(("720p (1280×720 lawn pair) ASW win 35, 11 candidates, "
                     "consistent", cell,
                     '"EXTREMELY SLOW on larger images" — the example '
                     "downscales 720p by 4× first (examples/009:31-34)"))
    if "gsw_mpixdisp_per_s" in p:
        g1 = p["gsw_mpixdisp_per_s"]
        cell = f"**{g1:.1f} Mpix·disp/s** single-frame (Pallas kernel)"
        if "gsw_batch8_mpixdisp_per_s" in p:
            cell += (f", **{p['gsw_batch8_mpixdisp_per_s']:.1f}"
                     " Mpix·disp/s/frame** batched")
        rows.append(("GSW (tuned: win 23, γ 12.5, fMax 20, 11 candidates, "
                     "consistent), Tsukuba", cell,
                     '"*Incomplete*… EXTREMELY SLOW. Do not use in '
                     'production" (passive.py:104-121)'))
    if "gsw_mi_mpixdisp_per_s" in p:
        gm = p["gsw_mi_mpixdisp_per_s"]
        cell = (f"**{gm:.1f} Mpix·disp/s** (3 MI iterations, consistent — "
                "whole refinement one device program; one-hot matmul "
                "histogram/cost maps)")
        if "gsw_mi_bad2_nonocc" in p:
            cell += f", bad-2.0 {p['gsw_mi_bad2_nonocc']*100:.1f} %"
        rows.append(("GSW mutual-information cost, Tsukuba", cell,
                     "unimplemented TODO (_passive.cpp:506-508)"))
    if "ftp_cloud_640x480_ms" in p:
        cell = (f"**{p['ftp_cloud_640x480_ms']:.0f} ms/frame** end-to-end "
                f"incl. link ({p.get('ftp_cloud_mpix_per_s', 0):.2f} "
                "Mpix/s; device+host compute ~27 ms since the r5 virtual-"
                "reference fast path — link-bound, see SCALING.md)")
        if "ftp_cloud_batch8_ms_per_frame" in p:
            cell += (f"; **{p['ftp_cloud_batch8_ms_per_frame']:.0f} "
                     "ms/frame** batched (`getCloudBatch`, dispatch paid "
                     "once per 8-frame stack)")
        rows.append(("StereoFTP scan → cloud, 640×480 synthetic plane",
                     cell, "host numpy/OpenCV per-stage round-trips"))
    if "graycode_decode_mpix_per_s" in p:
        cell = (f"**{p['graycode_decode_mpix_per_s']:.0f} Mpix/s** decode "
                "(one jitted bit-pack over the whole stack; readback of "
                "3 full-res maps dominates, so the figure swings with "
                "tunnel throughput — 44-88 measured across clean runs)")
        if "graycode_cloud_640x480_ms" in p:
            cell += (f"; full scan → cloud "
                     f"{p['graycode_cloud_640x480_ms']:.0f} ms (38-pattern "
                     "batch undistorted in one resample + host "
                     "triangulation)")
        rows.append(("Gray-code scan, 640×480", cell,
                     "per-pixel Python loop over `getProjPixel` "
                     "(active.py:1221-1226)"))

    block = "\n".join(f"| {a} | {b} | {c} |" for a, b, c in rows)
    readme = open("README.md").read()
    new = re.sub(
        r"(<!-- PERF:BENCH \(autogenerated from "
        r"BENCH_r\*\.json by benchmarks/update_readme_perf\.py\) -->\n)"
        r".*?(<!-- /PERF:BENCH -->)",
        lambda m: m.group(1) + block + "\n" + m.group(2),
        readme, flags=re.S)
    if new == readme and block not in readme:
        raise SystemExit("PERF:BENCH markers not found in README.md")
    open("README.md", "w").write(new)
    print(f"README.md perf rows regenerated from {path}")


if __name__ == "__main__":
    main()
