// Golden-generation harness: drives the REFERENCE EigenSolver
// (/root/reference/include/solver.h) through its Newton iteration and
// prints the per-step omega walk at full double precision, one JSON line
// per step.  The reference's own main() prints only 6 significant digits
// (src/main.cpp:52), too coarse for trajectory-parity assertions at 1e-8.
//
// Build (out-of-tree, see tests/goldens/tools/README.md):
//   g++ -std=c++20 -O3 -DMULTI_THREAD -DEMME_EXPRESSION_TEMPLATE \
//       -I .refbuild/shim -I /root/reference/include \
//       tests/goldens/tools/gen_trajectory.cpp \
//       /root/reference/src/{JsonParser,functions,Parameters,Timer,singularity_handler,solver}.cpp \
//       -o .refbuild/gen_trajectory liblapack.so.3 libblas.so.3 -lpthread
//
// Usage: gen_trajectory <input.json> <TraceSecant|QRSecant>
// NB: the reference JSON parser mis-reads exponent notation ("1e-6" -> 1);
// inputs fed to it must spell tolerances as plain decimals.
#include <complex>
#include <cstdio>
#include <iostream>

#include "Grid.h"
#include "JsonParser.h"
#include "Matrix.h"
#include "Parameters.h"
#include "singularity_handler.h"
#include "solver.h"

int main(int argc, char** argv) {
    if (argc < 3) {
        std::cerr << "usage: gen_trajectory <input.json> <method>\n";
        return 2;
    }
    auto input = util::json::parse_file(argv[1]);
    std::string method = argv[2];
    double tol = input.at("iteration_precision");

    auto& para = Parameters::generate(input);
    Grid<double> grid_info(para.length, para.npoints);
    Matrix<double> coeff_matrix = SingularityHandler(para.npoints);
    std::complex<double> guess(input.at("initial_guess")[0],
                               input.at("initial_guess")[1]);

    auto solver = EigenSolver<Matrix<std::complex<double>>>(
        para, guess, coeff_matrix, grid_info);

    for (int j = 0; j <= para.iteration_step_limit; j++) {
        if (method == "TraceSecant")
            solver.newtonTraceSecantIteration();
        else
            solver.newtonQRSecantIteration();
        std::printf(
            "{\"step\": %d, \"omega\": [%.17g, %.17g], "
            "\"d_omega\": [%.17g, %.17g]}\n",
            j + 1, solver.eigen_value.real(), solver.eigen_value.imag(),
            solver.d_eigen_value.real(), solver.d_eigen_value.imag());
        if (std::abs(solver.d_eigen_value) <
            std::abs(tol * solver.eigen_value))
            break;
    }
    return 0;
}
