#pragma once
// Shim for the differential-fuzz build of the reference caller
// (tests/test_reference_scoring.py): std-only replacements for the three
// boost.math statistics used at call_functions.tcc:51-53.
//
// Values are exact for the caller's inputs (uint16 protein lengths cast
// to float): sums of a few hundred small integers are exact in double,
// medians/MADs land on the half-integer grid.  We compute in double where
// real boost computes some of these in float — a last-ulp divergence that
// cannot flip any of the caller's comparisons on integer-valued data
// (documented in the test).
#include <algorithm>
#include <cmath>
#include <cstddef>

namespace boost { namespace math { namespace statistics {

template <class Container>
double mean(const Container &v) {
    double s = 0;
    for (auto x : v) s += (double)x;
    return s / (double)v.size();
}

template <class Container>
double median(Container &v) {
    // boost semantics: even n averages the two middle order statistics
    std::sort(v.begin(), v.end());
    std::size_t n = v.size();
    if (n % 2) return (double)v[n / 2];
    return ((double)v[n / 2 - 1] + (double)v[n / 2]) / 2.0;
}

template <class Container>
double median_absolute_deviation(Container v) {  // by value: keeps caller's data
    double c = median(v);
    for (auto &x : v)
        x = (typename Container::value_type)std::fabs((double)x - c);
    return median(v);
}

}}}  // namespace boost::math::statistics
