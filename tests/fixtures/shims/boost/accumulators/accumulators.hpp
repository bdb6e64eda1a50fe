#pragma once
// Shim: the reference's fusion path accumulates part-length medians in a
// float accumulator_set and reads back mean/variance
// (call_functions.tcc:469-470,540-542).  Faithful detail: sums accumulate
// in the SAMPLE type (float), matching boost's rounding — the golden spec
// (golden/call.py f32_mean) emulates the same float32 accumulation.
#include <cstddef>

namespace boost { namespace accumulators {

namespace tag {
struct count {};
struct mean {};
struct median {};
struct variance {};
}

template <class... T> struct stats {};

// NOTE on fidelity: real boost's sum accumulator stores the SAMPLE type
// (sum of float parts stays float — matched here, the fusion path needs
// it).  Fields computed through this shim (mean/median/variance of the
// build accumulators) are NOT compared in the differential tests, since
// they would only validate this shim, not boost (boost's P2 median is
// approximate anyway; FIDELITY.md).
template <class Sample, class Features>
struct accumulator_set {
    Sample sum_ = 0;
    double sumsq_ = 0;
    std::size_t n_ = 0;
    void operator()(Sample x) { sum_ += x; sumsq_ += (double)x * x; ++n_; }
};

template <class S, class F>
S mean(const accumulator_set<S, F> &a) { return a.sum_ / (S)a.n_; }

template <class S, class F>
std::size_t count(const accumulator_set<S, F> &a) { return a.n_; }

template <class S, class F>
double median(const accumulator_set<S, F> &a) {
    // stand-in (real boost: P2 streaming estimate); never compared
    return (double)a.sum_ / (double)a.n_;
}

template <class S, class F>
double variance(const accumulator_set<S, F> &a) {
    double m = (double)a.sum_ / (double)a.n_;
    return a.sumsq_ / (double)a.n_ - m * m;
}

}}  // namespace boost::accumulators
