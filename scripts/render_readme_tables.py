#!/usr/bin/env python
"""Render README.md's performance section FROM the captured bench
artifacts (VERDICT r4 item #6: a hand-maintained table drifted from the
driver-captured artifact twice; this script makes the table derivable
or absent).

Sources:
  - the bench.py capture (default BENCH_LOCAL.json, or a BENCH_r*.json
    passed as argv[1]) — interleaved same-session lanes with
    best/mean/spread and win/parity labels,
  - DEVICE_BENCH.json for the chip section.

The generated block sits between PERF_SECTION_BEGIN/END markers in
README.md and carries the artifact names + timestamps it was rendered
from.  Run after every bench capture; never hand-edit the block.
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BEGIN = "<!-- PERF_SECTION_BEGIN (generated; do not hand-edit) -->"
END = "<!-- PERF_SECTION_END -->"


def fmt_lane(name, lane, ours_rate, ref_rate, note):
    ratio = lane.get("ratio")
    label = lane.get("label") or ""
    spread = lane.get("ours", {}).get("spread_s")
    mean = lane.get("ours", {}).get("mean_s")
    rtxt = f"{ratio}x {label}" if ratio else "—"
    var = (f"±{spread}s of {mean}s" if spread is not None else "")
    return (f"| {name} | {ref_rate} | **{ours_rate}** | {rtxt} | "
            f"{var} | {note} |")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "BENCH_LOCAL.json")
    with open(src) as f:
        bench = json.load(f)
    dev = bench.get("device", {})
    det = bench["detail"]
    lanes = det["lanes"]
    srcname = os.path.basename(src)

    rows = []
    l = lanes["bam2sam"]
    rows.append(fmt_lane(
        "BAM->SAM end-to-end",
        l, f"{l['gbps']} GB/s", f"{l.get('ref_gbps', '—')} GB/s (-@16)",
        "fused native pipeline, raw-cursor formatter"))
    l = lanes["sam2bam"]
    rows.append(fmt_lane(
        "SAM->BAM (incl. BGZF deflate)", l, f"{l['gbps']} GB/s",
        (f"{round(l['gbps'] / l['ratio'], 4)} GB/s (-@16)"
         if l.get("ratio") else "—"),
        "fused parse + cached-compressor batch deflate"))
    l = lanes["cram_encode"]
    rows.append(fmt_lane(
        "CRAM encode (no-ref, file->file)", l, f"{l['krec_s']}k rec/s",
        (f"{round(l['krec_s'] / l['ratio'], 1)}k rec/s @16T"
         if l.get("ratio") else "—"),
        "division-free rANS, native planner"))
    l = lanes["cram_decode"]
    rows.append(fmt_lane(
        "CRAM decode -> SAM", l, f"{l['krec_s']}k rec/s",
        (f"{round(l['krec_s'] / l['ratio'], 1)}k rec/s @16T"
         if l.get("ratio") else "—"),
        f"arena slice decoder ({l.get('input', '')})"))
    l = lanes["mpileup"]
    rows.append(fmt_lane(
        "mpileup columns", l,
        (f"{l['out_mbps']} MB/s (serial; "
         f"{l.get('parallel_out_mbps')} MB/s parallel"
         + (f", {l.get('parallel_ratio')}x" if l.get("parallel_ratio")
            else "") + ")"),
        (f"{round(l['out_mbps'] / l['ratio'], 1)} MB/s @1T"
         if l.get("ratio") else "—"),
        "fused column scan+emit, coordinate tiles"))
    l = lanes["bcf2vcf"]
    rows.append(fmt_lane(
        "BCF->VCF", l, f"{l['out_mbps']} MB/s",
        (f"{round(l['out_mbps'] / l['ratio'], 1)} MB/s @1T"
         if l.get("ratio") else "—"),
        "raw-cursor vcf_format, MT by record ranges"))
    c31 = lanes.get("cram31", {})
    if c31:
        rows.append(
            f"| CRAM 3.1 encode / decode | — | "
            f"**{c31.get('encode_krec_s')}k / "
            f"{c31.get('decode_krec_s')}k rec/s** | — |  | "
            f"FQZ/TOK3 challenger caching |")

    dev_rows = []
    def dr(name, key, unit="MB/s", exact_key=None):
        v = dev.get(key)
        if v is None:
            return
        ex = dev.get(exact_key) if exact_key else None
        ex_t = " (exact)" if ex else ""
        dev_rows.append(f"| {name} | **{v} {unit}**{ex_t} |")

    dr("rANS Nx16 O0 decode (kernel-resident)",
       "rans_nx16_o0_MBps_resident", exact_key="rans_nx16_o0_exact")
    dr("rANS Nx16 O1 decode (kernel-resident)",
       "rans_nx16_o1_MBps_resident", exact_key="rans_nx16_o1_exact")
    dr("rANS 4x8 O0 decode (CRAM 3.0 wire)",
       "rans_4x8_o0_MBps_resident", exact_key="rans_4x8_o0_exact")
    dr("rANS 4x8 O1 decode", "rans_4x8_o1_MBps_resident",
       exact_key="rans_4x8_o1_exact")
    dr("rANS Nx16 O0 ENCODE (device-resident)",
       "rans_enc_MBps_resident", exact_key="rans_enc_exact")
    dr("whole-CRAM-3.1 file qual histogram (realistic quals)",
       "cram31_real_qualstats_file_MBps")
    dr("whole-CRAM-3.0 file qual histogram (realistic quals)",
       "cram30_real_qualstats_file_MBps")
    dr("BGZF stored-block write + on-chip CRC32", "bgzf_stored_MBps")
    h2d = dev.get("tunnel_h2d_MBps_at_end")
    d2h = dev.get("tunnel_d2h_MBps_at_end")

    block = []
    block.append(BEGIN)
    block.append("## Performance (measured on this host, 2 vCPUs + 1 "
                 "tunneled v5e chip)")
    block.append("")
    block.append(f"Generated from `{srcname}` "
                 f"(device section: DEVICE_BENCH.json, "
                 f"{dev.get('measured_at', '—')}) by "
                 f"`scripts/render_readme_tables.py` — regenerate, "
                 f"never hand-edit.  Method: {det.get('method', '—')}; "
                 "each lane alternates reference and our trials in one "
                 "session (this VM drifts 30-40%/day, so only "
                 "same-session pairs are comparable — BASELINE.md).  "
                 "Labels: win >= 1.3x (outside the rig's drift), "
                 "parity 0.77-1.3x.")
    block.append("")
    block.append("| Workload | htslib (same session) | htslib_tpu | "
                 "ratio | our spread | |")
    block.append("|---|---|---|---|---|---|")
    block.extend(rows)
    block.append("")
    ns = det.get("vs_north_star_per_chip_host_cpu_equiv")
    if ns is not None:
        block.append(
            f"vs the BASELINE.json north star (5 GB/s / 8 chips): "
            f"**{ns}x** — a HOST-CPU-equivalent number: the headline "
            "BAM->SAM lane runs entirely in the native host library "
            "on this rig (the chip contributes no bytes to it; "
            "docs/DEVICE_LIMITS.md explains why the tunnel makes that "
            "the right split here).")
        block.append("")
    if dev_rows:
        block.append("On-chip (wire-exact Pallas kernels; "
                     "docs/DEVICE_LIMITS.md round-5 section has the "
                     "measured op model):")
        block.append("")
        block.append("| Device lane | rate |")
        block.append("|---|---|")
        block.extend(dev_rows)
        block.append("")
        if h2d:
            block.append(
                f"File-level device lanes are bound by the axon h2d "
                f"tunnel ({h2d} MB/s at capture; it drifts 16-54 MB/s "
                "within a session) — kernel-resident rates are the "
                "hardware numbers; on a PCIe/ICI-attached host the "
                "file rate equals the kernel rate.")
            block.append("")
    block.append("The bench input is 400k unique paired records "
                 "(random per-record sequences, qualities, positions, "
                 "aux values).  This rig has 2 vCPUs; scaling past 2 "
                 "workers is not measurable here (BASELINE.md).")
    block.append(END)
    new_section = "\n".join(block)

    readme = os.path.join(REPO, "README.md")
    with open(readme) as f:
        text = f.read()
    if BEGIN in text:
        pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END),
                         re.S)
        text = pat.sub(new_section, text)
    else:
        # first run: replace the hand-written section
        pat = re.compile(r"## Performance \(measured.*?(?=## Status)",
                         re.S)
        text = pat.sub(new_section + "\n\n", text)
    with open(readme, "w") as f:
        f.write(text)
    print(f"README.md performance section rendered from {srcname}")


if __name__ == "__main__":
    main()
