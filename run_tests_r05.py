"""Collect the round's test evidence into TESTS_rNN.json (VERDICT r4 #7).

Runs the default suite, the slow-marked subset, and the 2-process
multihost test as separate pytest invocations and records pass/fail
counts + wall times. Run on the CPU mesh (conftest sanitizes the env).

Usage: python run_tests_r05.py [--out TESTS_r05.json]
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time


def run(args):
    t0 = time.time()
    p = subprocess.run([sys.executable, '-m', 'pytest', *args],
                       capture_output=True, text=True)
    wall = time.time() - t0
    tail = (p.stdout.strip().splitlines() or ['?'])[-1]
    m = {k: int(v) for v, k in re.findall(r'(\d+) (passed|failed|error|'
                                          r'skipped|deselected)', tail)}
    return {'cmd': 'pytest ' + ' '.join(args), 'wall_s': round(wall, 1),
            'summary': tail[:200], **m, 'rc': p.returncode}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='TESTS_r05.json')
    args = ap.parse_args()
    rec = {
        'artifact': 'round test evidence (VERDICT r4 item 7)',
        'env': 'sanitized CPU, 8-device virtual mesh (tests/conftest.py)',
        'default_suite': run(['tests/', '-q',
                              '--ignore=tests/test_multihost.py']),
        'slow_marked': run(['tests/', '-q', '-m', 'slow']),
        'multihost_2proc': run(['tests/test_multihost.py', '-q']),
    }
    rec['all_green'] = all(v.get('rc') == 0
                           for v in rec.values() if isinstance(v, dict))
    with open(args.out, 'w') as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=1))


if __name__ == '__main__':
    main()
