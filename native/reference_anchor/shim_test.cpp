// Shim validation: reproduces the reference's own golden unit test
// (/root/reference/rebvio/test/test_rebvio.cpp:6-18) without gtest, plus
// basic exp/ln/SVD/Cholesky round-trip checks for the TooN shim.
#include "rebvio/core.hpp"
#include <TooN/so3.h>
#include <TooN/SVD.h>
#include <TooN/Cholesky.h>
#include <cstdio>
#include <cmath>
#include <cstdlib>

static int failures = 0;
static void check_near(const char* name, double expect, double got,
                       double tol) {
  if (std::fabs(expect - got) > tol) {
    std::printf("FAIL %s: expect %.7g got %.7g\n", name, expect, got);
    ++failures;
  } else {
    std::printf("ok   %s: %.7g\n", name, got);
  }
}

int main() {
  using namespace rebvio;
  // --- golden value test (test_rebvio.cpp:6-18)
  Core core(std::make_shared<Camera>());
  types::Vector3f Vgv = TooN::makeVector(-4.06833e-05, 9.40667e-05, 5.70767e-05);
  types::Float dt = 0.05;
  types::Vector3f Av = TooN::makeVector(0, 0, 0);
  types::Matrix3f R = TooN::Data(1, 8.83134e-05, -7.48149e-05,
                                 -8.831e-05, 1, 4.57494e-05,
                                 7.4819e-05, -4.57428e-05, 1);
  core.estimateLs4Acceleration(-Vgv / dt, Av, R, dt);
  check_near("Av[0]", 0.0162734, Av[0], 1e-5);
  check_near("Av[1]", -0.0376267, Av[1], 1e-5);
  check_near("Av[2]", -0.0228307, Av[2], 1e-5);

  // --- SO3 exp/ln round trip
  types::Vector3f w = TooN::makeVector(0.3f, -0.2f, 0.7f);
  types::Vector3f w2 = TooN::SO3<types::Float>(w).ln();
  for (int i = 0; i < 3; ++i) check_near("so3 roundtrip", w[i], w2[i], 1e-5);

  // --- SVD backsub: solve A x = b for SPD A
  types::Matrix6f A = TooN::Zeros;
  for (int i = 0; i < 6; ++i) {
    A(i, i) = 2.0 + i;
    if (i + 1 < 6) {
      A(i, i + 1) = 0.5;
      A(i + 1, i) = 0.5;
    }
  }
  types::Vector6f b;
  for (int i = 0; i < 6; ++i) b[i] = i - 2.5;
  TooN::SVD<6, 6, types::Float> svd(A);
  types::Vector6f x = svd.backsub(b);
  types::Vector6f r = A * x - b;
  check_near("svd residual", 0.0, TooN::norm(r), 1e-4);

  // --- Cholesky inverse
  types::Matrix6f Ainv = TooN::Cholesky<6, types::Float>(A).get_inverse();
  types::Matrix6f I6 = A * Ainv;
  double maxerr = 0;
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j)
      maxerr = std::max(maxerr,
                        std::fabs(I6(i, j) - (i == j ? 1.0 : 0.0)));
  check_near("chol inverse", 0.0, maxerr, 1e-4);

  // --- two-vector SO3 ctor: R*a parallel to b
  types::Vector3f a = TooN::makeVector(0.2f, -0.9f, 0.1f);
  types::Vector3f bb = TooN::makeVector(0.0f, 1.0f, 0.0f);
  types::Vector3f ra = TooN::SO3<types::Float>(a, bb) * a;
  check_near("so3 two-vector x", 0.0, ra[0], 1e-5);
  check_near("so3 two-vector z", 0.0, ra[2], 1e-5);
  check_near("so3 two-vector norm", TooN::norm(a), ra[1], 1e-5);

  if (failures) {
    std::printf("%d FAILURES\n", failures);
    return 1;
  }
  std::printf("all shim tests passed\n");
  return 0;
}
