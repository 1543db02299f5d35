"""MFU / speed-of-light audit of the headline bench run (round-4
VERDICT item 8; stage numbers refreshed round 5): per-stage achieved
FLOPs and HBM bytes of the 0.332 s full-granule program vs TPU v5e peaks, so "is it actually fast" has a
denominator.

All FLOP/byte counts are analytic from the program's shapes (formulas
inline); stage seconds are the measured standalone numbers from
docs/BENCHMARK.md (chained-iteration timing on the v5e). Pure host
arithmetic — prints the markdown table BENCHMARK.md carries.

v5e peaks used: 197 TFLOP/s bf16 MXU; the 3-pass bf16 "HIGH" f32
emulation runs 3 MXU passes -> 65.7 TFLOP/s effective f32;
819 GB/s HBM.
"""

PEAK_BF16 = 197e12
PEAK_F32_3PASS = PEAK_BF16 / 3.0
HBM = 819e9

# program geometry (bench.py full scale)
HR, WR, B = 1242, 1280, 285
HO, WO = 1510, 1534          # geographic ortho grid (~from GLT)
HU, WU = 1523, 1550          # S2-anchored UTM 60 m grid
H10, W10 = 9140, 9309        # 10 m output grid
C = B + 1                    # validity channel rides the warp
WIN = 384                    # banded kernel source window
F4 = 4                       # f32 bytes

rows = []


def add(stage, flops, gbytes, meas_ms, note):
    sol_flop_ms = flops / PEAK_F32_3PASS * 1e3
    sol_hbm_ms = gbytes * 1e9 / HBM * 1e3
    sol = max(sol_flop_ms, sol_hbm_ms)
    util = sol / meas_ms if meas_ms else float("nan")
    rows.append((stage, flops / 1e12, gbytes, sol_flop_ms, sol_hbm_ms,
                 meas_ms, 100.0 * util, note))


# 1. GLT gather + banded two-pass warp (group 32, measured 93.4 ms)
gather_bytes = (HO * WO * C * F4 * 2 + HR * WR * B * F4) / 1e9
p1_flops = HO * W10 // 6 * 0 + HO * WU * WIN * C * 2   # pass 1
p2_flops = HU * WU * WIN * C * 2                        # pass 2 (per col)
warp_bytes = (HO * WO * C * F4      # src_ext read (pass 1)
              + WU * HO * C * F4 * 2  # h intermediate write + read
              + HU * WU * C * F4) / 1e9  # UTM out
add("GLT gather + banded 2-pass warp", p1_flops + p2_flops,
    gather_bytes + warp_bytes, 93.4,
    "window-sparse MXU matmuls; DMA/scheduling-bound (f32 == bf16x3)")

# 2. SRF synthesis (285 -> 3 matmul over the UTM cube)
add("SRF synthesis (matmul)", HU * WU * B * 3 * 2,
    (HU * WU * B * F4 + HU * WU * 3 * F4) / 1e9, 4.0,
    "reads the 2.7 GB cube once; est. from HBM bound")

# 3. phase-2 box downsample of the 10 m S2 (6x integer-ratio fast path)
add("phase-2 10m->60m box average", H10 * W10 * 3 * (6 + 6) * 2 / 6,
    (H10 * W10 * 3 * F4 + HU * WU * 3 * F4) / 1e9, 3.0,
    "pad/reshape block-sum; est. from HBM bound")

# 4. shared percentile stretch (sort) — measured
add("shared stretch (bit-search percentiles)", 0,
    (2 * HU * WU * 3 * F4 * 4) / 1e9, 17.4,
    "32 fused compare+count passes; run-time parity with the sort "
    "(headline unchanged), win is shape-independent codegen")

# 5. Sinkhorn 5000^2 x 300 + fit — measured
add("Sinkhorn OT (5000^2 x 300) + polyfit", 300 * 5000 * 5000 * 8,
    0.03, 40.0,
    "VPU elementwise exp+reduce wall (~133 us/iter, ~1 HBM pass/iter)")

# 6. phase-4 bilinear upsample + polyval at 10 m (fast path)
add("phase-4 60m->10m upsample + polyval",
    H10 * W10 * 3 * ((2 + 2) * 2 + 8),
    (H10 * W10 * 3 * F4 * 3 + HU * WU * 3 * F4) / 1e9, 51.3,
    "MEASURED round 5 (scripts/probe_phase4.py): bare upsample 49.2, "
    "epilogue ~1.4, transpose ~0.8")


def main():
    print("| stage | TFLOP | HBM GB | SoL flop ms | SoL HBM ms | "
          "measured ms | % of SoL | note |")
    print("|---|---|---|---|---|---|---|---|")
    tot_f = tot_b = tot_m = 0.0
    for st, tf, gb, sf, sh, ms, u, note in rows:
        print(f"| {st} | {tf:.3f} | {gb:.2f} | {sf:.1f} | {sh:.1f} | "
              f"{ms:.1f} | {u:.0f}% | {note} |")
        tot_f += tf
        tot_b += gb
        tot_m += ms
    sol_total = max(tot_f * 1e12 / PEAK_F32_3PASS,
                    tot_b * 1e9 / HBM) * 1e3
    print(f"| **total (sum of stages)** | {tot_f:.3f} | {tot_b:.2f} | "
          f"{tot_f * 1e12 / PEAK_F32_3PASS * 1e3:.1f} | "
          f"{tot_b * 1e9 / HBM * 1e3:.1f} | {tot_m:.1f} | | "
          f"measured end-to-end 332 ms (fused program overlaps stages) |")
    print()
    print(f"aggregate: {tot_f:.2f} TFLOP / 332 ms = "
          f"{tot_f * 1e12 / 0.332 / 1e12:.2f} TFLOP/s "
          f"({100 * tot_f * 1e12 / 0.332 / PEAK_F32_3PASS:.1f}% of the "
          f"3-pass-f32 MXU peak); {tot_b:.1f} GB / 332 ms = "
          f"{tot_b / 0.332:.0f} GB/s ({100 * tot_b / 0.332 / 819:.0f}% "
          f"of HBM peak)")


if __name__ == "__main__":
    main()
