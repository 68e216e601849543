"""tabix CLI (reference tabix.c:614): build TBI/CSI indexes over bgzipped
text and query regions."""
from __future__ import annotations

import argparse
import sys

from htslib_tpu.bgzf import BGZFReader
from htslib_tpu.tbx import CONF_BED, CONF_GFF, CONF_SAM, CONF_VCF, PRESETS, Tabix, TbxConf


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tabix", description=__doc__)
    p.add_argument("-p", "--preset", choices=sorted(PRESETS))
    p.add_argument("-s", "--sequence", type=int, default=0)
    p.add_argument("-b", "--begin", type=int, default=0)
    p.add_argument("-e", "--end", type=int, default=0)
    p.add_argument("-S", "--skip-lines", type=int, default=0)
    p.add_argument("-c", "--comment", default="#")
    p.add_argument("-0", "--zero-based", action="store_true", dest="zero")
    p.add_argument("-C", "--csi", action="store_true")
    p.add_argument("-m", "--min-shift", type=int, default=14)
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("-l", "--list-chroms", action="store_true")
    p.add_argument("-R", "--regions")
    p.add_argument("-T", "--targets")
    p.add_argument("-@", "--threads", type=int, default=1)
    p.add_argument("file")
    p.add_argument("regions", nargs="*")
    a = p.parse_args(argv)

    build = a.preset is not None or a.sequence or a.begin
    if build and not a.regions and not a.list_chroms:
        if a.preset:
            conf = PRESETS[a.preset]
        else:
            from htslib_tpu.tbx import TBX_UCSC
            conf = TbxConf(TBX_UCSC if a.zero else 0, a.sequence, a.begin,
                           a.end, ord(a.comment[0]), a.skip_lines)
        Tabix.build(a.file, conf, min_shift=a.min_shift if a.csi else 0)
        return 0

    tbx = Tabix.load_for(a.file)
    if a.list_chroms:
        for n in tbx.names:
            print(n)
        return 0
    with BGZFReader(a.file) as fp:
        region_list = list(a.regions)
        if a.regions is not None and a.regions:
            pass
        if a.targets:
            region_list += [l.strip() for l in open(a.targets) if l.strip()]
        for region in region_list:
            for line in tbx.query_region(fp, region):
                print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
