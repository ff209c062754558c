"""Dataset acquisition helpers (graceful in offline environments).

Both reference datasets are license-gated and cannot be fetched
anonymously — the reference README tells users to download them by hand
(classification/README.md "Data Preparation", segmentation/README.md):

  * ScanObjectNN: h5 files from the official HKUST release (requires
    agreement form); the training recipe needs
    ``{training,test}_objectdataset_augmentedrot_scale75.h5``
    (classification/dataset/ScanObjectNNDataLoader.py:26-29).
  * S3DIS: ``stanford_indoor3d`` room .npy files (xyzrgbl, N x 7) derived
    from the Stanford release form (segmentation/dataset/S3DISDataLoader.py).

``fetch(...)`` therefore tries, in order:
  1. an already-populated ``root`` (no-op success);
  2. a mirror URL from ``REPSURF_DATA_MIRROR`` (a base URL the operator
     controls, e.g. an internal object store) with a short timeout;
  3. otherwise raises DataUnavailable with an actionable message listing
     the exact paths to provision.

Nothing here retries forever or blocks startup: offline hosts fail in
~seconds with instructions instead of stack traces.
"""

import os
import urllib.error
import urllib.request

SCANOBJECTNN_FILES = (
    "training_objectdataset_augmentedrot_scale75.h5",
    "test_objectdataset_augmentedrot_scale75.h5",
)

S3DIS_SENTINEL = "Area_5_office_1.npy"  # any populated stanford_indoor3d dir


class DataUnavailable(RuntimeError):
    """Raised when a dataset is absent and no mirror can provide it."""


def _try_mirror(base, rel, dest, timeout=10):
    url = base.rstrip("/") + "/" + rel
    tmp = dest + ".part"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(
            tmp, "wb"
        ) as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
        return True
    except (urllib.error.URLError, OSError, ValueError):
        if os.path.exists(tmp):
            os.remove(tmp)
        return False


def fetch_scanobjectnn(root):
    """Ensure the ScanObjectNN h5 pair exists under ``root``.

    Returns root on success; raises DataUnavailable with provisioning
    instructions otherwise.
    """
    os.makedirs(root, exist_ok=True)
    missing = [
        f for f in SCANOBJECTNN_FILES if not os.path.exists(os.path.join(root, f))
    ]
    if not missing:
        return root
    mirror = os.environ.get("REPSURF_DATA_MIRROR")
    if mirror:
        still = [
            f
            for f in missing
            if not _try_mirror(
                mirror, "scanobjectnn/" + f, os.path.join(root, f)
            )
        ]
        if not still:
            return root
        missing = still
    raise DataUnavailable(
        "ScanObjectNN (PB_T50_RS) is not present and could not be fetched "
        f"(offline or no mirror). Provision these files under {root}:\n  "
        + "\n  ".join(missing)
        + "\nThe dataset is license-gated (HKUST agreement form; see the "
        "reference classification/README.md). Operators can also set "
        "REPSURF_DATA_MIRROR=<base-url> hosting scanobjectnn/<file>."
    )


def fetch_s3dis(root):
    """Ensure a stanford_indoor3d room dump exists under ``root``."""
    if os.path.isdir(root) and any(
        name.endswith(".npy") for name in os.listdir(root)
    ):
        return root
    os.makedirs(root, exist_ok=True)
    mirror = os.environ.get("REPSURF_DATA_MIRROR")
    if mirror and _try_mirror(
        mirror, "s3dis/" + S3DIS_SENTINEL, os.path.join(root, S3DIS_SENTINEL)
    ):
        # a mirror that serves one room is expected to serve the manifest
        manifest = os.path.join(root, "manifest.txt")
        if _try_mirror(mirror, "s3dis/manifest.txt", manifest):
            with open(manifest) as f:
                names = [line.strip() for line in f if line.strip()]
            for name in names:
                dest = os.path.join(root, name)
                if not os.path.exists(dest):
                    _try_mirror(mirror, "s3dis/" + name, dest)
        if any(n.endswith(".npy") for n in os.listdir(root)):
            return root
    raise DataUnavailable(
        "S3DIS (stanford_indoor3d .npy rooms) is not present and could not "
        f"be fetched (offline or no mirror). Provision room files under "
        f"{root} (xyzrgbl [N, 7] .npy per room, e.g. Area_5_office_1.npy; "
        "derived from the license-gated Stanford release — see the "
        "reference segmentation/README.md). Operators can also set "
        "REPSURF_DATA_MIRROR=<base-url> hosting s3dis/manifest.txt + rooms."
    )
