// clean-room stub: boost::algorithm::join over a sequence of strings
#ifndef STUB_BOOST_ALGO_JOIN_HPP
#define STUB_BOOST_ALGO_JOIN_HPP
#include <string>
namespace boost { namespace algorithm {
template <typename Seq>
std::string join(const Seq& seq, const std::string& sep)
{
    std::string out;
    bool first = true;
    for (typename Seq::const_iterator it = seq.begin();
         it != seq.end(); ++it) {
        if (!first) out += sep;
        out += *it;
        first = false;
    }
    return out;
}
}}
#endif
