#!/usr/bin/env python
"""Materialize the reference config family under cfgs/.

The YAML schema is the compatibility surface (config keys/values ARE the
reference's experiment definitions), so each file is carried over
semantically: parsed, validated against our config schema (strict unknown
keys), and re-emitted with a provenance header. Existing files are left
untouched. Run from the repo root.
"""

import glob
import os
import sys

sys.path.insert(0, ".")

REF = "/root/reference/cfgs"
OUT = "cfgs"


def main():
    from cpm_tpu.config import get_default_cfg, merge_cfg_from_file

    created, skipped = 0, 0
    for src in sorted(glob.glob(f"{REF}/**/*.yaml", recursive=True)):
        rel = os.path.relpath(src, REF)
        dst = os.path.join(OUT, rel)
        if os.path.exists(dst):
            skipped += 1
            continue
        # validate against our schema before writing
        merge_cfg_from_file(src, get_default_cfg())
        with open(src) as f:
            lines = f.read().splitlines()
        ap_comment = lines[0] if lines and lines[0].startswith("#") else None
        body = lines[1:] if ap_comment else lines
        header = [
            f"# reference: cfgs/{rel}",
        ]
        if ap_comment:
            header.append(ap_comment)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            f.write("\n".join(header + body) + "\n")
        created += 1
    print(f"created {created}, kept {skipped} existing")


if __name__ == "__main__":
    main()
