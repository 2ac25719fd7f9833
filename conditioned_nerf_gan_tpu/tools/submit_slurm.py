"""Slurm job submission + source snapshotting.

Parity target: reference submitSlurmjob.py:20-157 (sbatch script generation,
job tracking/cancel helpers) and version.sh (source tarball snapshot so a
requeued job runs the exact submitted code). Resume-on-requeue works because
the Trainer auto-resumes from the newest checkpoint in -o (training/
checkpoints.py), matching the reference's idempotent-resume design
(utils.py:287-311).
"""

from __future__ import annotations

import argparse
import subprocess
import tarfile
import time
from pathlib import Path

SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --output={output_dir}/logs/%j.out
#SBATCH --error={output_dir}/logs/%j.err
#SBATCH --time={time_limit}
#SBATCH --cpus-per-task={cpus}
#SBATCH --mem={mem}
#SBATCH {accel}
#SBATCH --requeue
#SBATCH --mail-type=END,TIME_LIMIT

cd {snapshot_dir}
{python} train.py -o {output_dir} {train_args}
"""


def snapshot_source(repo_dir: str | Path, output_dir: str | Path) -> Path:
    """Tar the source tree next to the run (version.sh equivalent) and unpack
    it so the job runs the submitted code even if the repo moves on."""
    repo_dir = Path(repo_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    tar_path = output_dir / f"source_{stamp}.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        for pattern in ("conditioned_nerf_gan_tpu", "train.py", "inference.py",
                        "bench.py", "tests"):
            src = repo_dir / pattern
            if src.exists():
                tar.add(src, arcname=pattern)
    snapshot_dir = output_dir / f"source_{stamp}"
    snapshot_dir.mkdir(exist_ok=True)
    with tarfile.open(tar_path) as tar:
        tar.extractall(snapshot_dir)
    return snapshot_dir


def write_sbatch(
    output_dir: str | Path,
    name: str = "cnerfgan",
    time_limit: str = "24:00:00",
    cpus: int = 6,
    mem: str = "16G",
    accelerator: str = "--tpus=1",
    train_args: str = "",
    python: str = "python",
    repo_dir: str | Path = ".",
) -> Path:
    output_dir = Path(output_dir)
    (output_dir / "logs").mkdir(parents=True, exist_ok=True)
    snapshot_dir = snapshot_source(repo_dir, output_dir)
    script = SBATCH_TEMPLATE.format(
        name=name, output_dir=output_dir, time_limit=time_limit, cpus=cpus,
        mem=mem, accel=accelerator, snapshot_dir=snapshot_dir,
        python=python, train_args=train_args,
    )
    path = output_dir / "submit.sbatch"
    path.write_text(script)
    return path


def submit(sbatch_path: str | Path) -> str:
    out = subprocess.run(
        ["sbatch", str(sbatch_path)], capture_output=True, text=True, check=True
    )
    return out.stdout.strip()


def list_jobs(user: str | None = None) -> str:
    cmd = ["squeue"] + (["-u", user] if user else ["--me"])
    return subprocess.run(cmd, capture_output=True, text=True).stdout


def cancel(job_id: str) -> None:
    subprocess.run(["scancel", str(job_id)], check=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Submit training to Slurm")
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("--name", default="cnerfgan")
    parser.add_argument("--time", default="24:00:00")
    parser.add_argument("--cpus", type=int, default=6)
    parser.add_argument("--mem", default="16G")
    parser.add_argument("--accelerator", default="--tpus=1")
    parser.add_argument("--train_args", default="")
    parser.add_argument("--dry_run", action="store_true",
                        help="write the sbatch script without submitting")
    parser.add_argument("--cancel", default=None, help="cancel a job id")
    parser.add_argument("--list", action="store_true")
    args = parser.parse_args(argv)

    if args.cancel:
        cancel(args.cancel)
        return
    if args.list:
        print(list_jobs())
        return
    path = write_sbatch(
        args.output_dir, args.name, args.time, args.cpus, args.mem,
        args.accelerator, args.train_args,
    )
    print("Wrote", path)
    if not args.dry_run:
        print(submit(path))


if __name__ == "__main__":
    main()
