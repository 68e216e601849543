"""annot-tsv tests vs reference test/annot-tsv/out.*.txt goldens
(cases from test.pl test_annot_tsv)."""
import os
import shlex
import subprocess
import sys

import pytest

from tests.conftest import REF_TEST, REPO

AT_DIR = os.path.join(REF_TEST, "annot-tsv")

CASES = [
    ("src.1.txt", "dst.1.txt", "out.1.1.txt", "-f smpl:overlap --allow-dups"),
    ("src.1.txt", "dst.1.txt", "out.1.2.txt", "-f smpl:overlap"),
    ("src.1.txt", "dst.1.txt", "out.1.2.txt", "-f smpl:overlap -c chr,beg,end"),
    ("src.1.txt", "dst.1.txt", "out.1.3.txt", "-f smpl,value:overlap,value"),
    ("src.1.txt", "dst.1.txt", "out.1.4.txt", "-f smpl:overlap -O 0.5"),
    ("src.1.txt", "dst.1.txt", "out.1.5.txt", "-f smpl:overlap -r -O 0.5"),
    ("src.1.txt", "dst.1.txt", "out.1.6.txt",
     "-f smpl:overlap --allow-dups --max-annots 2"),
    ("src.2.txt", "dst.2.txt", "out.2.1.txt",
     "-c 1,2,3:1,2,3 -f 4:5 --allow-dups"),
    ("src.2.txt", "dst.2.txt", "out.2.2.txt", "-c 1,2,3:1,2,3 -f 4:5"),
    ("src.2.txt", "dst.2.txt", "out.2.3.txt", "-c 1,2,3:1,2,3 -f 4,value:5,value"),
    ("src.2.txt", "dst.2.txt", "out.2.4.txt", "-c 1,2,3:1,2,3 -f value,4:value,5"),
    ("src.2.txt", "dst.2.txt", "out.2.5.txt",
     "-c 1,2,3:1,2,3 -f value,4:value,5 -a nbp,frac"),
    ("src.2.txt", "dst.2.txt", "out.2.6.txt",
     "-c 1,2,3:1,2,3 -f 4:5 --allow-dups --max-annots 2"),
    ("src.3.txt", "dst.3.txt", "out.3.1.txt", "-f smpl:overlap -a nbp,frac"),
    ("src.4.txt", "dst.4.txt", "out.4.1.txt",
     "-c 2,3,4:2,3,4 -m 1:1 -f 1:1 -a nbp,frac"),
    ("src.5.txt", "dst.5.txt", "out.5.1.txt", "-c 2,3,4:2,3,4 -a nbp,frac"),
    ("src.6.txt", "dst.6.txt", "out.6.1.txt", "-c 1,2,2:1,2,2 -a nbp"),
    ("src.7.txt", "dst.7.txt", "out.7.1.txt", "-c 1,2,2:1,2,2 -f overlap -H"),
    ("src.8.txt", "dst.8.txt", "out.8.1.txt",
     "-c chr,beg,end:chr,start,end -m sample -f is_tp"),
    ("src.9.txt", "dst.9.txt", "out.9.1.txt", "-c 1,2,3:chr,beg,end -a nbp,frac,cnt"),
    ("src.10.txt", "dst.10.txt", "out.10.1.txt", "-f smpl"),
    ("src.10.txt", "dst.10.txt", "out.10.2.txt", ""),
    ("src.10.txt", "dst.10.txt", "out.10.3.txt", "-x"),
    ("src.10.txt", "dst.10.txt", "out.10.4.txt", "-m smpl -f smpl"),
    ("src.10.txt", "dst.10.txt", "out.10.5.txt", "-m smpl"),
    ("src.10.txt", "dst.10.txt", "out.10.6.txt", "-m smpl -x"),
    ("src.11.txt", "dst.11.txt", "out.11.1.txt", "-c 1,2,3:1,2,3 -f 4:5 -h 0:0"),
    ("src.11.txt", "dst.11.txt", "out.11.1.txt",
     "-c chr1,beg1,end1:chr,beg,end -f smpl1:src_smpl -h 2:2 -I -I"),
    ("src.11.txt", "dst.11.txt", "out.11.1.txt",
     "-c chr1,beg1,end1:chr,beg,end -f smpl1:src_smpl -h 2:-1 -I -I"),
    ("src.11.txt", "dst.11.txt", "out.11.2.txt",
     "-c chr1,beg1,end1:chr,beg,end -f smpl1:src_smpl -h 2:2"),
    ("src.11.txt", "dst.11.txt", "out.11.2.txt",
     "-c chr2,beg2,end2:chr,beg,end -f smpl2:src_smpl -h 3:2"),
    ("src.11.txt", "dst.11.txt", "out.11.3.txt",
     "-c chr1,beg1,end1:chr,beg,end -f smpl1:src_smpl -h 2:2 -I"),
    ("src.12.txt", "dst.12.txt", "out.12.1.txt",
     "-c 1,2,3:1,2,3 -f 4:5 -h 0:0 -d ,"),
    ("src.13.txt", "src.13.txt", "out.13.1.txt", "-c 1,2,3 -f 4:5"),
    ("src.13.txt", "src.13.txt", "out.13.1.txt", "-c 1,2,3 -f 4:5 -O 0.5"),
    ("src.13.txt", "src.13.txt", "out.13.2.txt", "-c 1,2,3 -f 4:5 -O 0.5 -r"),
]


@pytest.mark.parametrize("src,dst,out,args", CASES)
def test_annot_tsv_goldens(src, dst, out, args):
    if not os.path.exists(os.path.join(AT_DIR, src)):
        pytest.skip("missing corpus")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        [sys.executable, "-m", "htslib_tpu.cli.annot_tsv"]
        + shlex.split(args)
        + ["-s", os.path.join(AT_DIR, src), "-t", os.path.join(AT_DIR, dst)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert res.returncode == 0, res.stderr
    want = open(os.path.join(AT_DIR, out)).read()
    assert res.stdout == want, f"{out} with args {args!r}"
