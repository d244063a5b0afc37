"""Summarizes a chip-sweep output directory (perf/chip_sweep.sh) into one table.

    python perf/ingest_sweep.py [/tmp/tpuval]

Pulls the one-line results out of each step's log: bench.py JSON lines,
fused_bench ms/step lines, train_flagship FINAL lines, tpu_check ALL OK, and
the scaling harness's steps/s — then prints them with the decision rules from
perf/EXPERIMENTS.md alongside.
"""
import json
import re
import sys
from pathlib import Path


def last_match(path, pattern):
    if not path.exists():
        return None
    hits = re.findall(pattern, path.read_text())
    return hits[-1] if hits else None


def main():
    d = Path(sys.argv[1] if len(sys.argv) > 1 else '/tmp/tpuval')
    rows = []

    parity = last_match(d / 'parity.log', r'ALL OK.*')
    rows.append(('parity gate', parity or 'MISSING/FAILED — stop here'))

    for name, label in [('explorer', 'Explorer bench'),
                        ('deathm', 'Deathmatch bench'),
                        ('explorerF', 'Explorer --fast'),
                        ('deathmF', 'Deathmatch --fast'),
                        ('deathmDF', 'Deathmatch --draw-fused'),
                        ('deathmDFF', 'Deathmatch --draw-fused --fast')]:
        line = last_match(d / f'{name}.log', r'\{.*"metric".*\}')
        if line:
            j = json.loads(line)
            rows.append((label, f"{j['value']:,} {j['unit']} "
                                f"({j['vs_baseline']}x baseline)"))
        else:
            rows.append((label, 'no result'))

    for name, label in [('fbE16', 'fused res512 E=16'),
                        ('fbE32', 'fused res512 E=32'),
                        ('fbFD', 'fused res512 fast-div')]:
        line = last_match(d / f'{name}.log', r'fused: [\d.]+ ms/step.*')
        rows.append((label, line or 'no result'))

    line = last_match(d / 'flagship.log', r'FINAL: .*')
    rows.append(('flagship sustained', line or 'no result'))
    line = last_match(d / 'scaling.log', r'1 device: .*')
    rows.append(('sharded train step', line or 'no result'))

    width = max(len(k) for k, _ in rows) + 2
    for k, v in rows:
        print(f'{k:<{width}} {v}')


if __name__ == '__main__':
    main()
