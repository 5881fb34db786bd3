"""OOD threshold calibration CLI.

Reference: AFSD/thumos14/threshold.py (__main__, :157-170): run the
standard inference stack over the TRAINING videos, compose a confidence
score per proposal, pick the 95%-TPR percentile as the rejection
threshold, and store it in the detection JSON's external_data.

CLI: python -m opental_tpu.tools.threshold <cfg.yaml> [flags]
"""

from __future__ import annotations

import json
import os

from opental_tpu.config import config_from_args
from opental_tpu.openset.threshold import calibrate
from opental_tpu.tools.test import build_pipeline


def main(argv=None) -> None:
    cfg = config_from_args(argv)
    te = cfg.testing
    output_file = os.path.join(te.get('output_path', './output'),
                               te.get('output_json', 'thresholding.json'))
    if os.path.exists(output_file):
        with open(output_file) as f:
            threshold = float(json.load(f)['external_data']['threshold'])
        print(f'Thresholding result file already exist at {output_file}!')
    else:
        pipe, _, _ = build_pipeline(cfg)
        threshold = calibrate(cfg, pipe)
    print(f'The threshold is: {threshold:.12f}')


if __name__ == '__main__':
    main()
