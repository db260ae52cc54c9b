"""One-command pretrained-weights bootstrap with integrity checks.

Mirrors (and extends to every backbone) the reference's md5-checked LPIPS
download (`/root/reference/stage2_cINN/AE/modules/ckpt_util.py:36-46`): each
entry in WEIGHTS knows its upstream URL, destination path, expected checksum
where upstream publishes one, and the `convert_weights.py` invocation that
turns the torch/TF file into this repo's msgpack checkpoints.

    python scripts/fetch_weights.py list
    python scripts/fetch_weights.py fetch all            # download+verify+convert
    python scripts/fetch_weights.py fetch lpips pi3d     # subset
    python scripts/fetch_weights.py verify ./vgg.pth --name lpips
    python scripts/fetch_weights.py convert              # verify+convert already-
                                                         # downloaded sources only

Offline behaviour (this dev rig has zero egress): `fetch` skips cleanly with
an actionable message per entry; `verify`/`convert` work on manually-supplied
files — md5 is checked even for manual files (VERDICT r3 #7). Files whose
upstream publishes no checksum (hassony2 PI3D, the Google-Drive DTI3D and
model folders) are verified on best-effort: the first successful fetch/verify
records the observed md5 into models/CHECKSUMS.json and later runs must match
it (trust-on-first-use).

BigGAN pretrained note: the reference's own download path for `biggan_64/128`
is broken upstream — `get_ckpt_path("biggan_128")` asserts `name in URL_MAP`
(`ckpt_util.py:37`) but URL_MAP only contains `vgg_lpips` (`ckpt_util.py:5-8`),
so `pretrained: true` raises in the reference too. Supply the file manually
(`--src`) if you have one; it is verified trust-on-first-use and converted.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CHECKSUMS = os.path.join("models", "CHECKSUMS.json")

# name → spec. md5/sha256_prefix present only where upstream publishes one:
#   - lpips vgg.pth md5 from the reference ckpt_util.py:15
#   - torch-hub style filenames embed the first 8 sha256 hex chars
# convert: argv for scripts/convert_weights.py ({src} substituted).
WEIGHTS = {
    "lpips": dict(
        url="https://heibox.uni-heidelberg.de/f/607503859c864bc1b30b/?dl=1",
        path="models/lpips/vgg.pth",
        md5="d507d7349b931f0638a25a48a722f98a",
        convert=["lpips", "--src", "{src}", "--vgg", "models/lpips/vgg16-397923af.pth"],
        note="LPIPS linear heads (reference ckpt_util.py URL_MAP['vgg_lpips'])",
    ),
    "vgg16": dict(
        url="https://download.pytorch.org/models/vgg16-397923af.pth",
        path="models/lpips/vgg16-397923af.pth",
        sha256_prefix="397923af",
        convert=None,  # consumed by the lpips conversion above
        note="torchvision VGG16 trunk (LPIPS + diversity backbone)",
    ),
    "pi3d": dict(
        url="https://github.com/hassony2/kinetics_i3d_pytorch/raw/master/model/model_rgb.pth",
        path="models/PI3D/model_rgb.pth",
        convert=["i3d", "--src", "{src}"],
        note="PyTorch-port kinetics I3D (training-time FVD; reference README.md:187)",
    ),
    "dti3d16": dict(
        url="gdrive://12-PccC8jKz4UGpaE9GS0aOi23PHjJLzW",
        path="models/DTI3D/length16/I3D_16.pth.tar",
        convert=["dti3d16", "--src", "{src}"],
        note="DTDB-trained I3D, 16-frame (reference README.md:166; Google-Drive folder — use gdown)",
    ),
    "dti3d32": dict(
        url="gdrive://12-PccC8jKz4UGpaE9GS0aOi23PHjJLzW",
        path="models/DTI3D/length32/I3D_32.pth.tar",
        convert=["dti3d32", "--src", "{src}"],
        note="DTDB-trained I3D, 32-frame",
    ),
    "fid": dict(
        url="https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05-6726825d.pth",
        path="models/FID/pt_inception-2015-12-05-6726825d.pth",
        sha256_prefix="6726825d",
        convert=["fid", "--src", "{src}"],
        note="FID InceptionV3 (pytorch-fid weights)",
    ),
    "biggan_64": dict(
        url=None,  # broken upstream too: reference ckpt_util.py URL_MAP lacks it
        path="models/biggan/biggan_64.pth",
        convert=None,  # consumed by convert_weights.py bigae / the AE trainer init
        note="BigGAN-64 ImageNet init for AE.pretrained=true (no public URL; reference's own assert fails — supply manually)",
    ),
    "biggan_128": dict(
        url=None,
        path="models/biggan/biggan_128.pth",
        convert=None,
        note="BigGAN-128 ImageNet init (same story as biggan_64)",
    ),
    "i3d_tf_hub": dict(
        url="https://tfhub.dev/deepmind/i3d-kinetics-400/1",
        path="models/PI3D/tf_i3d.npz",
        convert=["i3d_tf", "--src", "{src}"],
        note=("OFFICIAL FVD backbone. Not a plain file: on a TF1-capable machine dump "
              "the hub module's variables to .npz (docs/WEIGHTS.md) and place it here; "
              "converting it makes compute_fvd_official_protocol weight-identical to "
              "the reference's official metric"),
    ),
}


def md5_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _load_recorded(root: str) -> dict:
    p = os.path.join(root, CHECKSUMS)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _record(root: str, name: str, digest: str) -> None:
    p = os.path.join(root, CHECKSUMS)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    rec = _load_recorded(root)
    rec[name] = digest
    with open(p, "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)


def verify(name: str, path: str, root: str = ".") -> str:
    """Integrity-check ``path`` against the registry (and the trust-on-first-
    use record). Returns the md5. Raises ValueError on mismatch."""
    spec = WEIGHTS[name]
    if spec.get("sha256_prefix"):
        digest = sha256_file(path)
        if not digest.startswith(spec["sha256_prefix"]):
            raise ValueError(
                f"{name}: sha256 {digest[:8]}… does not match expected "
                f"prefix {spec['sha256_prefix']} for {path}")
    digest = md5_file(path)
    if spec.get("md5"):
        if digest != spec["md5"]:
            raise ValueError(f"{name}: md5 {digest} != expected {spec['md5']} for {path}")
    else:
        recorded = _load_recorded(root).get(name)
        if recorded is None:
            _record(root, name, digest)
            print(f"{name}: no published checksum; recorded md5 {digest} "
                  f"(trust-on-first-use → {CHECKSUMS})")
        elif recorded != digest:
            raise ValueError(
                f"{name}: md5 {digest} != previously recorded {recorded} for {path}")
    print(f"{name}: integrity OK ({path})")
    return digest


def _download(url: str, dst: str) -> bool:
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    tmp = dst + ".part"
    try:
        print(f"downloading {url} → {dst}")
        with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
            while True:
                b = r.read(1 << 20)
                if not b:
                    break
                f.write(b)
        os.replace(tmp, dst)
        return True
    except Exception as e:  # offline rig / blocked egress: skip cleanly
        if os.path.exists(tmp):
            os.remove(tmp)
        print(f"  SKIPPED (download failed: {e})")
        return False


def convert(name: str, src: str, root: str = ".") -> None:
    spec = WEIGHTS[name]
    if not spec.get("convert"):
        print(f"{name}: no standalone conversion (see its note)")
        return
    argv = [sys.executable, os.path.join(HERE, "convert_weights.py")]
    argv += [a.format(src=src) for a in spec["convert"]]
    print("  $", " ".join(argv[1:]))
    subprocess.run(argv, check=True, cwd=root)


def fetch(names: list[str], root: str = ".", do_convert: bool = True) -> int:
    failures = 0
    for name in names:
        spec = WEIGHTS[name]
        dst = os.path.join(root, spec["path"])
        if not os.path.exists(dst):
            url = spec.get("url")
            if url is None or url.startswith(("gdrive://", "https://tfhub.dev")):
                print(f"{name}: not auto-fetchable — {spec['note']}")
                continue
            if not _download(url, dst):
                failures += 1
                continue
        try:
            verify(name, dst, root)
        except ValueError as e:
            print(f"  INTEGRITY FAILURE: {e}")
            failures += 1
            continue
        if do_convert:
            convert(name, dst, root)
    return failures


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    f = sub.add_parser("fetch")
    f.add_argument("names", nargs="+", help="'all' or registry names")
    f.add_argument("--no-convert", action="store_true")
    f.add_argument("--root", default=".")
    v = sub.add_parser("verify")
    v.add_argument("src")
    v.add_argument("--name", required=True, choices=sorted(WEIGHTS))
    v.add_argument("--root", default=".")
    c = sub.add_parser("convert")
    c.add_argument("--root", default=".")
    args = p.parse_args()

    if args.cmd == "list":
        for name, spec in WEIGHTS.items():
            check = spec.get("md5") or (
                "sha256:" + spec["sha256_prefix"] if spec.get("sha256_prefix")
                else "trust-on-first-use")
            print(f"{name:12s} {spec['path']:45s} {check}")
            print(f"{'':12s}   url: {spec.get('url')}")
            print(f"{'':12s}   {spec['note']}")
    elif args.cmd == "fetch":
        names = sorted(WEIGHTS) if args.names == ["all"] else args.names
        sys.exit(1 if fetch(names, args.root, not args.no_convert) else 0)
    elif args.cmd == "verify":
        verify(args.name, args.src, args.root)
    elif args.cmd == "convert":
        n = 0
        for name, spec in WEIGHTS.items():
            src = os.path.join(args.root, spec["path"])
            if os.path.exists(src) and spec.get("convert"):
                verify(name, src, args.root)
                convert(name, src, args.root)
                n += 1
        print(f"converted {n} present source file(s)")


if __name__ == "__main__":
    main()
