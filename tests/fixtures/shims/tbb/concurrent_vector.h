#pragma once
// Shim: serial stand-ins for the TBB containers/algorithms named by the
// reference caller headers.  The differential driver only exercises the
// serial paths; parallel_for runs the body inline over the whole range.
#include <iterator>
#include <vector>

#include "parallel_for.h"  // single home of the serial parallel_for shim

namespace tbb {

template <class T>
class concurrent_vector : public std::vector<T> {
public:
    using std::vector<T>::vector;
    struct range_type {
        typename std::vector<T>::iterator b, e;
        typename std::vector<T>::iterator begin() const { return b; }
        typename std::vector<T>::iterator end() const { return e; }
    };
    range_type range() { return {this->begin(), this->end()}; }
    // tbb's push_back returns an iterator to the new element
    typename std::vector<T>::iterator push_back(const T &v) {
        std::vector<T>::push_back(v);
        return std::prev(this->end());
    }
};

}  // namespace tbb
