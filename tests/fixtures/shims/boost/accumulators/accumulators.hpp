#pragma once
// Shim: the reference's fusion path accumulates part-length medians in a
// float accumulator_set and reads back mean/variance
// (call_functions.tcc:469-470,540-542).  Faithful detail: sums accumulate
// in the SAMPLE type (float), matching boost's rounding — the golden spec
// (golden/call.py f32_mean) emulates the same float32 accumulation.
#include <cstddef>

namespace boost { namespace accumulators {

namespace tag {
struct mean {};
struct median {};
struct variance {};
}

template <class... T> struct stats {};

template <class Sample, class Features>
struct accumulator_set {
    Sample sum_ = 0;
    Sample sumsq_ = 0;
    std::size_t n_ = 0;
    void operator()(Sample x) { sum_ += x; sumsq_ += x * x; ++n_; }
};

template <class S, class F>
S mean(const accumulator_set<S, F> &a) { return a.sum_ / (S)a.n_; }

template <class S, class F>
S variance(const accumulator_set<S, F> &a) {
    S m = a.sum_ / (S)a.n_;
    return a.sumsq_ / (S)a.n_ - m * m;
}

}}  // namespace boost::accumulators
