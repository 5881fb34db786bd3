"""Video acquisition CLI (datasets/download.py semantics) without
network: a stub downloader binary records its invocations and fabricates
the output files; failures retry and report 'Fail'."""

import json
import os
import stat
import subprocess
import sys

from opental_tpu.tools.download import (download_all, main,
                                        read_video_ids)

STUB = """#!/usr/bin/env python3
import os, sys
args = sys.argv[1:]
out = args[args.index('-o') + 1]
url = args[-1]
vid = url.rsplit('=', 1)[1]
with open(os.environ['STUB_LOG'], 'a') as f:
    f.write(vid + '\\n')
if vid.startswith('bad'):
    sys.exit(1)
open(out, 'wb').write(b'mp4')
"""


def make_stub(tmp_path):
    stub = tmp_path / 'fake-dl'
    stub.write_text(STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    log = tmp_path / 'calls.log'
    log.write_text('')
    os.environ['STUB_LOG'] = str(log)
    return str(stub), log


def test_read_video_ids(tmp_path):
    anno = tmp_path / 'a.json'
    anno.write_text(json.dumps({'abcdefghijk': {}, 'zzzzzzzzzzz': {}}))
    assert sorted(read_video_ids(str(anno))) == ['abcdefghijk',
                                                 'zzzzzzzzzzz']
    # ActivityNet-style nesting
    anno2 = tmp_path / 'b.json'
    anno2.write_text(json.dumps({'database': {'v_123': {}}}))
    assert read_video_ids(str(anno2)) == ['v_123']
    ids = tmp_path / 'ids.txt'
    ids.write_text('one\n\ntwo\n')
    assert read_video_ids(str(ids)) == ['one', 'two']


def test_download_all(tmp_path):
    stub, log = make_stub(tmp_path)
    out = tmp_path / 'videos'
    status = download_all(['goodvideo01', 'badvideo001'], str(out),
                          jobs=2, downloader=stub, attempts=3)
    by_id = {s[0]: s for s in status}
    assert by_id['goodvideo01'][1:] == (True, 'Downloaded')
    assert by_id['badvideo001'][1:] == (False, 'Fail')
    assert (out / 'goodvideo01.mp4').exists()
    calls = log.read_text().split()
    assert calls.count('badvideo001') == 3    # retried
    assert calls.count('goodvideo01') == 1
    # idempotence: existing file short-circuits without a call
    status = download_all(['goodvideo01'], str(out), jobs=1,
                          downloader=stub)
    assert status[0][2] == 'Exists'
    assert log.read_text().split().count('goodvideo01') == 1


def test_cli_report(tmp_path):
    stub, _ = make_stub(tmp_path)
    anno = tmp_path / 'a.json'
    anno.write_text(json.dumps({'vidvidvid01': {}}))
    report = tmp_path / 'report.json'
    main([str(anno), str(tmp_path / 'v'), '-n', '1',
          '--downloader', stub, '--report', str(report)])
    rep = json.load(open(report))
    assert rep == [['vidvidvid01', True, 'Downloaded']]
