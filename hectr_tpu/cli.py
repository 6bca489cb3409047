"""Command-line driver -- the reference `test-hectr` L5 surface.

Subcommands mirror tests/hectr.c:933-973 (quadprog, cstr-ode,
mpc-tracking, inverted-pendulum-mpc-control, cstr-mpc, cstr-hempc,
cstr-cmp), with one fix: the reference's usage string advertises
--logn/--logq-style flags that nothing parses (tests/hectr.c:936-938);
here the CKKS parameter flags are real.  Plots are matplotlib
equivalents of the reference's gnuplot scripts (written next to the
trajectory artifacts when --plot is given).

Usage:  python -m hectr_tpu.cli <subcommand> [--out-dir results]
        [--logn 12] [--scale-bits 50] [--slots 16] [--depth 1]
        [--steps 40] [--plot] [--platform cpu|tpu]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np


def _cstr_setup():
    from hectr_tpu.control.plants import (
        CSTR_STEADY_STATE, cstr_jacobian, cstr_linearize, cstr_ode)
    from hectr_tpu.control.simulate import LinearModel, Plant

    ss = CSTR_STEADY_STATE
    A, B, _ = cstr_linearize(ss["xs"], ss["us"], ss["ps"], 1.0)
    model = LinearModel(
        A=A, B=B, C=np.eye(3), Bd=np.zeros((3, 2)),
        Cd=np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]]),
        Hr=np.array([[1.0, 0, 0], [0, 0, 1.0]]))
    plant = Plant(ode=cstr_ode, jacobian=cstr_jacobian,
                  xs=ss["xs"], us=ss["us"], ps=ss["ps"])
    return model, plant


def _plot_traj(out_dir, name, x, u):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = ["c (kmol/m^3)", "T (K)", "h (m)", "Tc (K)", "F (m^3/min)"]
    cols = np.hstack([x, np.vstack([u, u[-1:]])])
    fig, axes = plt.subplots(5, 1, figsize=(7, 11), sharex=True)
    for i, ax in enumerate(axes):
        ax.plot(cols[:, i])
        ax.set_ylabel(labels[i])
        ax.grid(True, alpha=0.3)
    axes[-1].set_xlabel("step")
    fig.suptitle(name)
    fig.tight_layout()
    fig.savefig(pathlib.Path(out_dir) / f"{name}.pdf")
    plt.close(fig)


def cmd_cstr_ode(args):
    import jax.numpy as jnp

    from hectr_tpu.control.ode import rk4_step, stiff_step
    from hectr_tpu.control.plants import CSTR_STEADY_STATE, cstr_jacobian, cstr_ode

    xs = CSTR_STEADY_STATE["xs"]
    u = jnp.array([290.0, 0.1])
    p = jnp.array([0.1])
    x45 = jnp.asarray(xs)
    x15 = jnp.asarray(xs)
    rows = [[0.0, *np.asarray(x45)[:2], *np.asarray(x15)[:2]]]
    for i in range(1, 6):
        x45 = rk4_step(cstr_ode, x45, u, p, 1.0)
        x15 = stiff_step(cstr_ode, cstr_jacobian, x15, u, p, 1.0)
        rows.append([float(i), *np.asarray(x45)[:2], *np.asarray(x15)[:2]])
    out = pathlib.Path(args.out_dir) / "cstr-ode.txt"
    np.savetxt(out, np.array(rows), fmt="%9.6f")
    print(f"wrote {out}")


def cmd_cstr_mpc(args, encrypted=False):
    import jax

    from hectr_tpu.control.simulate import simulate
    from hectr_tpu.utils import timed, write_traj_bin, write_traj_txt

    model, plant = _cstr_setup()
    N = args.steps
    p_seq = np.zeros((N, 1))
    p_seq[min(9, N):, 0] = 0.01
    name = "cstr-hempc" if encrypted else "cstr-mpc"
    if encrypted:
        from hectr_tpu.config import CKKSPreset
        from hectr_tpu.ckks import scheme as S
        from hectr_tpu.ckks.context import make_context
        from hectr_tpu.ckks.keyswitch import gen_rotation_keys
        from hectr_tpu.hempc import hempc_init_state, make_hempc_regulator

        if args.preset:
            from hectr_tpu.config import PRESETS
            preset = PRESETS[args.preset]
        else:
            preset = CKKSPreset(name="cli", logn=args.logn, slots=args.slots,
                                scale_bits=args.scale_bits, limb_bits=25,
                                mult_depth=args.depth)
        ctx = make_context(preset)
        with timed("he_keypair"):
            keys = S.keygen(ctx, jax.random.PRNGKey(args.seed))
        with timed("he_genrk"):
            rks = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(args.seed + 1))
        reg = make_hempc_regulator(ctx, keys, rks, model, plant, N // 10)
        with timed("closed-loop simulate"):
            x, u, (_, canary) = simulate(
                model, plant, p_seq, 1.0, N, regulator=reg,
                regulator_state=hempc_init_state(
                    jax.random.PRNGKey(args.seed + 2)),
                return_state=True)
        # reference asserts imag residue < 1e-5 on every decode
        # (src/ctr.c:493-494); the canary is the max across the loop
        assert float(canary) < 1e-5, float(canary)
        print(f"noise canary max|Im(decode)| = {float(canary):.3e}")
    else:
        with timed("closed-loop simulate"):
            x, u = simulate(model, plant, p_seq, 1.0, N)
    out_dir = pathlib.Path(args.out_dir)
    write_traj_txt(out_dir / f"{name}.txt", x, u)
    write_traj_bin(out_dir / f"{name}.bin", x, u)
    print(f"wrote {out_dir}/{name}.{{txt,bin}}; final state {x[-1].round(4)}")
    if args.plot:
        _plot_traj(out_dir, name, x, u)


def cmd_cstr_cmp(args):
    from hectr_tpu.utils import traj_compare

    out_dir = pathlib.Path(args.out_dir)
    diff = traj_compare(out_dir / "cstr-mpc.bin", out_dir / "cstr-hempc.bin",
                        out_dir / "cstr-cmp.bin")
    print("max |plaintext - encrypted| per channel:", diff.max(axis=0))


def cmd_mpc_tracking(args):
    from hectr_tpu.control.mpc import MPCBounds, ctr_mpc

    A = np.array([[0.8, 1.0], [0.0, 0.9]])
    B = np.array([[-1.0], [2.0]])
    x0 = np.array([0.0, -1.0])
    u0 = np.array([-0.1])
    r1 = np.array([1.0, 0.25])
    cases = {
        5: (r1, MPCBounds()),
        6: (r1, MPCBounds(dumin=[-0.5], dumax=[0.5])),
        7: (r1, MPCBounds(dumin=[-0.3], dumax=[0.2])),
        8: (np.zeros(2), MPCBounds(dumin=[-0.3], dumax=[0.2])),
        9: (np.zeros(2), MPCBounds(umin=[-0.3], umax=[0.1])),
        11: (np.zeros(2), MPCBounds(xmin=[-1.5, -2.5], xmax=[0.5, 0.2])),
        12: (np.zeros(2), MPCBounds(dumin=[-0.5], dumax=[0.5],
                                    xmin=[-1.5, -2.5], xmax=[0.5, 0.2])),
    }
    out_dir = pathlib.Path(args.out_dir)
    for case, (rsp, bounds) in cases.items():
        u = ctr_mpc(2, 2, 1, 30, A, B, np.eye(2), np.eye(2), np.eye(1),
                    xhat=x0, uhat=u0, xr=rsp, ur=np.zeros(1), bounds=bounds)
        y = [x0]
        for k in range(30):
            y.append(A @ y[-1] + B @ u[k])
        y = np.array(y)
        rows = [(k, u[min(k, 29), 0], y[k, 0], y[k, 1]) for k in range(31)]
        path = out_dir / f"mpc-tracking-{case}.txt"
        with open(path, "w") as f:
            for k, uk, y0, y1 in rows:
                f.write(f"{k:2d} {uk:12.8f} {y0:12.8f} {y1:12.8f}\n")
        print(f"wrote {path}")


def cmd_pendulum(args):
    from hectr_tpu.control.linalg import c2d
    from hectr_tpu.control.mpc import ctr_mpc

    l_bar, mcar, mball, g = 2.0, 1.0, 0.3, 9.8
    Ac = np.array([[0, 1, 0, 0], [0, 0, mball * g / mcar, 0],
                   [0, 0, 0, 1], [0, 0, g * (mcar + mball) / (l_bar * mcar), 0]])
    Bc = np.array([[0.0], [1 / mcar], [0.0], [1 / (l_bar * mcar)]])
    Ad, Bint = c2d(Ac, 0.1)
    Bd = Bint @ Bc
    C = np.array([[0, 1, 0, 0], [0, 0, 1, 0]], dtype=float)
    x0 = np.array([0, 0, 0.3, 0.0])
    u = ctr_mpc(2, 4, 1, 30, Ad, Bd, C, np.eye(2), np.array([[0.01]]),
                xhat=x0, uhat=np.zeros(1), xr=np.zeros(4), ur=np.zeros(1))
    x = [x0]
    for k in range(30):
        x.append(Ad @ x[-1] + Bd.ravel() * u[k, 0])
    out = pathlib.Path(args.out_dir) / "inverted-pendulum-mpc-control.txt"
    with open(out, "w") as f:
        for k in range(31):
            f.write(f"{k:2d} {u[min(k, 29), 0]:12.8f} "
                    + " ".join(f"{v:12.8f}" for v in x[k]) + "\n")
    print(f"wrote {out}")


def cmd_quadprog(args):
    del args
    import subprocess

    # run the oracle suite and report
    r = subprocess.run([sys.executable, "-m", "pytest", "tests/test_qp.py",
                       "-q"], capture_output=True, text=True)
    print(r.stdout.strip().splitlines()[-1])


def cmd_cstr_lqr(args):
    from hectr_tpu.control.simulate import make_lqr_regulator, simulate
    from hectr_tpu.utils import timed, write_traj_bin, write_traj_txt

    model, plant = _cstr_setup()
    N = args.steps
    p_seq = np.zeros((N, 1))
    p_seq[min(9, N):, 0] = 0.01
    reg = make_lqr_regulator(model, plant)
    with timed("closed-loop simulate (lqr)"):
        x, u = simulate(model, plant, p_seq, 1.0, N, regulator=reg)
    out_dir = pathlib.Path(args.out_dir)
    write_traj_txt(out_dir / "cstr-lqr.txt", x, u)
    write_traj_bin(out_dir / "cstr-lqr.bin", x, u)
    print(f"wrote {out_dir}/cstr-lqr.{{txt,bin}}; final state {x[-1].round(4)}")
    if args.plot:
        _plot_traj(out_dir, "cstr-lqr", x, u)


def cmd_scaling(args):
    """NTT scaling-efficiency report (north star: >= 70% at 2+ hosts).
    Runs on whatever devices exist: the virtual CPU mesh in tests, a
    pod slice after init_distributed on real hardware."""
    import json as _json

    import jax
    from jax.sharding import Mesh
    import numpy as _np

    from hectr_tpu.parallel.multihost import (
        init_distributed, ntt_scaling_efficiency)

    init_distributed()
    devs = _np.array(jax.devices())
    d = 1 << (devs.size.bit_length() - 1)   # largest power of two
    mesh = Mesh(devs[:d], ("coeff",))
    rep = ntt_scaling_efficiency(args.logn, args.depth * 2 + 2, mesh)
    print(_json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in rep.items()}))


def cmd_security(args):
    """Security accounting for every registered CKKS preset (HE
    standard table; the reference publishes no security statement)."""
    from hectr_tpu.config import PRESETS
    from hectr_tpu.ckks.security import security_report

    for preset in PRESETS.values():
        print(security_report(preset))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hectr-tpu", description=__doc__)
    ap.add_argument("subcommand", choices=[
        "quadprog", "cstr-ode", "mpc-tracking",
        "inverted-pendulum-mpc-control", "cstr-mpc", "cstr-hempc",
        "cstr-cmp", "cstr-lqr", "scaling", "security"])
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--preset", default=None,
                    help="named CKKS preset (reference-hempc, medium, "
                         "flagship, flagship-qp, ...); overrides "
                         "--logn/--slots/--scale-bits/--depth")
    ap.add_argument("--scale-bits", type=int, default=50)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (cpu/tpu/axon)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    pathlib.Path(args.out_dir).mkdir(parents=True, exist_ok=True)

    dispatch = {
        "quadprog": cmd_quadprog,
        "cstr-ode": cmd_cstr_ode,
        "mpc-tracking": cmd_mpc_tracking,
        "inverted-pendulum-mpc-control": cmd_pendulum,
        "cstr-mpc": lambda a: cmd_cstr_mpc(a, encrypted=False),
        "cstr-hempc": lambda a: cmd_cstr_mpc(a, encrypted=True),
        "cstr-cmp": cmd_cstr_cmp,
        "cstr-lqr": cmd_cstr_lqr,
        "scaling": cmd_scaling,
        "security": cmd_security,
    }
    dispatch[args.subcommand](args)


if __name__ == "__main__":
    main()
