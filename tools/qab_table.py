"""Render the quality-A/B JSONL (bench.py --quality_ab --ab_state ...)
as the PERF.md evidence table: per-(style, variant) PSNR mean +/- std
with n, paired deltas vs each variant's control (culled-control,
refine_culled-refine — pairing per bench.py:AB_CONTROL), and the
pose-refinement MPJPE summary.

CPU-only; no device touch.  Usage:
    python tools/qab_table.py artifacts/quality_ab_round5.jsonl
"""
import json
import statistics
import sys
from collections import defaultdict

PAIRING = {'culled': 'control', 'refine': 'control',
           'refine_culled': 'refine', 'refine_warm': 'control',
           'refine_culled_warm': 'refine_warm', 'fast': 'control',
           'sr': 'control', 'sr_culled': 'control', 'fastv2': 'control'}


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if 'config' not in r and 'tag' in r:   # round-3 schema
                r['config'] = r['tag']
            rows.append(r)
    # dedup on the resume key (or full identity for keyless old rows),
    # last write wins
    return list({tuple(r.get('key',
                             (r['style'], r['seed'], r['config']))): r
                 for r in rows}.values())


def fmt(mean, std, n):
    return f'{mean:.2f} ± {std:.2f} (n={n})' if n > 1 else f'{mean:.2f}'


def main(path):
    rows = load(path)
    if not rows:
        print(f'no rows in {path}')
        return 1
    styles = sorted({r['style'] for r in rows})
    variants = sorted({r['config'] for r in rows},
                      key=lambda v: (v != 'control', v))
    cells = defaultdict(list)          # (style, variant) -> [psnr]
    for r in rows:
        cells[(r['style'], r['config'])].append(r)

    print(f'Source: {path} — {len(rows)} cells, '
          f'{len(styles)} styles x {len(variants)} variants\n')
    hdr = '| style | ' + ' | '.join(variants) + ' |'
    print(hdr)
    print('|' + '---|' * (len(variants) + 1))
    for s in styles:
        out = [s]
        for v in variants:
            rs = cells.get((s, v), [])
            if not rs:
                out.append('—')
                continue
            ps = [r['psnr'] for r in rs]
            out.append(fmt(statistics.mean(ps),
                           statistics.pstdev(ps) if len(ps) > 1 else 0.0,
                           len(ps)))
        print('| ' + ' | '.join(out) + ' |')

    print('\nPaired deltas (variant − its control, per style×seed cell):\n')
    print('| pair | median ΔPSNR | mean | std | n |')
    print('|---|---|---|---|---|')
    for v in variants:
        base = PAIRING.get(v)
        if base is None or base not in variants:
            continue
        deltas = []
        for s in styles:
            bysd = defaultdict(dict)
            for r in rows:
                if r['style'] == s and r['config'] in (v, base):
                    bysd[r['seed']][r['config']] = r
            for sd, d in sorted(bysd.items()):
                if v in d and base in d:
                    deltas.append(d[v]['psnr'] - d[base]['psnr'])
        if deltas:
            print(f'| {v} − {base} | {statistics.median(deltas):+.2f} | '
                  f'{statistics.mean(deltas):+.2f} | '
                  f'{statistics.pstdev(deltas):.2f} | {len(deltas)} |')

    refine = [r for r in rows if 'mpjpe_mm' in r]
    if refine:
        print('\nPose refinement (perturbed-pose cells):\n')
        print('| variant | init MPJPE (mm) | refined MPJPE | PA-MPJPE | n |')
        print('|---|---|---|---|---|')
        for v in sorted({r['config'] for r in refine}):
            rs = [r for r in refine if r['config'] == v]
            med = lambda k: statistics.median([r[k] for r in rs])
            print(f"| {v} | {med('init_mpjpe_mm'):.1f} | "
                  f"{med('mpjpe_mm'):.1f} | {med('pa_mpjpe_mm'):.1f} | "
                  f"{len(rs)} |")
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1
                  else 'artifacts/quality_ab_round5.jsonl'))
