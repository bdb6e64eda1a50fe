#pragma once
#include <deque>

namespace tbb {

template <class T>
class concurrent_bounded_queue {
public:
    void set_capacity(long) {}
    void push(const T &v) { q_.push_back(v); }
    bool try_pop(T &out) {
        if (q_.empty()) return false;
        out = q_.front();
        q_.pop_front();
        return true;
    }
    void pop(T &out) { out = q_.front(); q_.pop_front(); }

private:
    std::deque<T> q_;
};

template <class T>
using concurrent_queue = concurrent_bounded_queue<T>;

}  // namespace tbb
