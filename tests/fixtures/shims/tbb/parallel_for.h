#pragma once
// Serial stand-ins for tbb parallel_for / blocked_range / atomic used by
// the reference build path (signature_build.h/.tcc).
#include <atomic>
#include <cstddef>

namespace tbb {

template <class T>
using atomic = std::atomic<T>;

template <class T>
class blocked_range {
public:
    blocked_range(T b, T e) : b_(b), e_(e) {}
    T begin() const { return b_; }
    T end() const { return e_; }

private:
    T b_, e_;
};

// (the Range/Body overload taking .range() results lives in
// concurrent_vector.h; this generic one also covers blocked_range)
template <class Range, class Body>
void parallel_for(const Range &r, const Body &body) { body(r); }

}  // namespace tbb
