// Golden generator for util::calculate_omega (reference
// include/solver_pic.h:475-529), compiled TWICE -- with and without
// -DEMME_USE_VIEWS -- to pin BOTH time-weight conventions of the gamma fit
// (the views lambda increments t BEFORE weighting: weights dt..n*dt vs the
// plain loop's 0..(n-1)*dt).  Drives the reference header directly on a
// deterministic synthetic stats series; output: one line
// "omega gamma" consumed by tests/test_pic.py::test_omega_fit_views_golden.
#include <cmath>
#include <complex>
#include <cstdio>
#include <tuple>
#include <vector>

#include "solver_pic.h"

int main() {
    // synthetic growing oscillation: Re phi = e^{g t} cos(w t) + wobble,
    // rms = e^{g t} (1 + small ripple) -- deterministic, no RNG
    const double dt = 0.25, g = 0.21, w = 0.83;
    const int n = 180;
    std::vector<std::tuple<double, double, double>> stats;
    for (int i = 1; i <= n; ++i) {
        double t = i * dt;
        double grow = std::exp(g * t);
        double re = grow * std::cos(w * t) + 1e-3 * std::sin(3.1 * t);
        double im = grow * std::sin(w * t);
        double norm = grow * (1.0 + 0.01 * std::sin(1.7 * t));
        stats.emplace_back(re, im, norm);
    }
    auto om = util::calculate_omega(stats, dt);
    std::printf("%.17g %.17g\n", om.real(), om.imag());
    return 0;
}
