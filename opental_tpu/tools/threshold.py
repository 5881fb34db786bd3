"""OOD threshold calibration CLI.

Reference: AFSD/thumos14/threshold.py (__main__, :157-170) and
AFSD/anet/threshold.py (:66-79): run the standard inference stack over
the TRAINING videos, compose a confidence score per proposal, pick the
95%-TPR percentile as the rejection threshold, and store it in the
detection JSON's external_data. The config's model.arch selects the
THUMOS or ANet driver.

CLI: python -m opental_tpu.tools.threshold <cfg.yaml> [flags]
"""

from __future__ import annotations

import json
import os

from opental_tpu.config import config_from_args
from opental_tpu.openset.threshold import calibrate, calibrate_anet
from opental_tpu.tools.test import build_pipeline


def main(argv=None) -> None:
    import argparse
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument('--binary', action='store_true')
    extra.add_argument('--cls_score_file', type=str, default=None)
    ns, rest = extra.parse_known_args(argv)
    cfg = config_from_args(rest)
    te = cfg.testing
    output_file = os.path.join(te.get('output_path', './output'),
                               te.get('output_json', 'thresholding.json'))
    if os.path.exists(output_file):
        with open(output_file) as f:
            threshold = float(json.load(f)['external_data']['threshold'])
        print(f'Thresholding result file already exist at {output_file}!')
    elif cfg.get_path('model.arch') == 'anet':
        threshold = calibrate_anet(cfg, binary=ns.binary,
                                   cls_score_file=ns.cls_score_file)
    else:
        pipe, _, _ = build_pipeline(cfg)
        threshold = calibrate(cfg, pipe)
    print(f'The threshold is: {threshold:.12f}')


if __name__ == '__main__':
    main()
